"""Losses vs torch oracles (ssim) and reference math (sequence loss)."""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.fast

from gps_gaussian_tpu.train import losses

torch = pytest.importorskip("torch")


def _torch_ssim(img1_nchw, img2_nchw, window_size=11):
    """The reference's ssim (lib/loss.py:39-83)."""
    import torch.nn.functional as F
    from math import exp

    def gaussian(window_size, sigma):
        g = torch.Tensor([exp(-(x - window_size // 2) ** 2
                              / float(2 * sigma ** 2))
                          for x in range(window_size)])
        return g / g.sum()

    channel = img1_nchw.size(-3)
    _1d = gaussian(window_size, 1.5).unsqueeze(1)
    _2d = _1d.mm(_1d.t()).float().unsqueeze(0).unsqueeze(0)
    window = _2d.expand(channel, 1, window_size, window_size).contiguous()

    mu1 = F.conv2d(img1_nchw, window, padding=window_size // 2,
                   groups=channel)
    mu2 = F.conv2d(img2_nchw, window, padding=window_size // 2,
                   groups=channel)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = F.conv2d(img1_nchw * img1_nchw, window,
                  padding=window_size // 2, groups=channel) - mu1_sq
    s2 = F.conv2d(img2_nchw * img2_nchw, window,
                  padding=window_size // 2, groups=channel) - mu2_sq
    s12 = F.conv2d(img1_nchw * img2_nchw, window,
                   padding=window_size // 2, groups=channel) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    m = (((2 * mu1_mu2 + C1) * (2 * s12 + C2))
         / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)))
    return m.mean()


def test_ssim_matches_torch(rng):
    a = rng.uniform(0, 1, size=(2, 32, 32, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.05, size=a.shape), 0, 1).astype(
        np.float32)
    ours = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = float(_torch_ssim(torch.from_numpy(a).permute(0, 3, 1, 2),
                            torch.from_numpy(b).permute(0, 3, 1, 2)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    assert float(losses.ssim(jnp.asarray(a), jnp.asarray(a))) > 0.999


def test_psnr_basic(rng):
    a = rng.uniform(0, 1, size=(2, 16, 16, 3)).astype(np.float32)
    b = np.clip(a + 0.1, 0, 1).astype(np.float32)
    p = np.asarray(losses.psnr(jnp.asarray(a), jnp.asarray(b)))
    assert p.shape == (2,)
    mse = ((a - b) ** 2).reshape(2, -1).mean(1)
    np.testing.assert_allclose(p, 20 * np.log10(1 / np.sqrt(mse)),
                               rtol=1e-5)


def test_sequence_loss_matches_reference_math(rng):
    """Against a literal transcription of lib/loss.py:8-33."""
    n = 3
    preds = [rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
             for _ in range(n)]
    gt = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
    valid = (rng.uniform(size=(2, 8, 8, 1)) > 0.3).astype(np.float32)

    loss, metrics = losses.sequence_loss(
        [jnp.asarray(p) for p in preds], jnp.asarray(gt),
        jnp.asarray(valid))

    v = valid >= 0.5
    adj = 0.9 ** (15 / (n - 1))
    ref_loss = sum((adj ** (n - i - 1)) * np.abs(p - gt)[v].mean()
                   for i, p in enumerate(preds))
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)

    epe = np.sqrt(((preds[-1] - gt) ** 2).sum(-1))
    epe = epe[v[..., 0]]
    np.testing.assert_allclose(float(metrics["train_epe"]), epe.mean(),
                               rtol=1e-5)
    np.testing.assert_allclose(float(metrics["train_1px"]),
                               (epe < 1).mean(), rtol=1e-5)
