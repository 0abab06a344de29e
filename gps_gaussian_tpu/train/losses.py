"""Losses & metrics: sequence flow loss, L1, SSIM, PSNR (capability of
reference lib/loss.py).  All NHWC, f32, jit-safe with static shapes.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def sequence_loss(flow_preds: Sequence[jnp.ndarray], flow_gt: jnp.ndarray,
                  valid: jnp.ndarray, loss_gamma: float = 0.9
                  ) -> Tuple[jnp.ndarray, dict]:
    """Gamma-weighted L1 over the GRU-iteration predictions.

    Math of reference lib/loss.py:8-33: the gamma is adjusted as
    0.9^(15/(n-1)) so the weighting is consistent for any iteration count;
    the per-iteration L1 is averaged over valid pixels only.

    Args:
      flow_preds: per-iteration (B, H, W, 1) disparity predictions.
      flow_gt: (B, H, W, 1); valid: (B, H, W, 1) in {0, 1}.
    Returns (loss scalar, metrics dict of scalars).
    """
    n = len(flow_preds)
    v = (valid >= 0.5).astype(jnp.float32)
    denom = jnp.maximum(v.sum(), 1.0)

    adjusted_gamma = loss_gamma ** (15.0 / max(n - 1, 1))
    loss = 0.0
    for i, pred in enumerate(flow_preds):
        w = adjusted_gamma ** (n - i - 1)
        i_loss = jnp.abs(pred - flow_gt)
        loss = loss + w * (i_loss * v).sum() / denom

    epe = jnp.sqrt(jnp.sum((flow_preds[-1] - flow_gt) ** 2, axis=-1))
    vm = v[..., 0]
    epe_denom = jnp.maximum(vm.sum(), 1.0)
    metrics = {
        "train_epe": (epe * vm).sum() / epe_denom,
        "train_1px": ((epe < 1).astype(jnp.float32) * vm).sum() / epe_denom,
        "train_3px": ((epe < 3).astype(jnp.float32) * vm).sum() / epe_denom,
    }
    return loss, metrics


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - gt).mean()


def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(window_size, dtype=np.float64) - window_size // 2
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray,
         window_size: int = 11) -> jnp.ndarray:
    """Windowed SSIM, per-channel gaussian window 11x11 sigma 1.5.

    Math of reference lib/loss.py:39-83 (same constants C1/C2, SAME padding,
    depthwise convolution).  img*: (B, H, W, C) in [0, 1].
    """
    c = img1.shape[-1]
    win = jnp.asarray(_gaussian_window(window_size))          # (K, K)
    kernel = jnp.tile(win[:, :, None, None], (1, 1, 1, c))    # (K, K, 1, C)

    def filt(x):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32), kernel,
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = filt(img1 * img1) - mu1_sq
    sigma2_sq = filt(img2 * img2) - mu2_sq
    sigma12 = filt(img1 * img2) - mu1_mu2

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = (((2 * mu1_mu2 + c1) * (2 * sigma12 + c2))
                / ((mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)))
    return ssim_map.mean()


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Per-image PSNR for [0,1] images, (B,) (reference lib/loss.py:86-88)."""
    b = img1.shape[0]
    mse = ((img1 - img2) ** 2).reshape(b, -1).mean(axis=1)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))
