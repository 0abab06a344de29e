"""Golden tests for sampling/correlation ops vs torch (CPU) oracles.

torch is used ONLY as an independent oracle here (grid_sample, avg_pool,
unfold semantics) — the framework itself never imports it.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.fast

from gps_gaussian_tpu.ops import corr as corr_ops
from gps_gaussian_tpu.ops import sampling

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_bilinear_sampler(img_nchw, coords_xy):
    """The reference's bilinear_sampler (core/utils/utils.py:59-75)."""
    H, W = img_nchw.shape[-2:]
    xgrid, ygrid = coords_xy.split([1, 1], dim=-1)
    xgrid = 2 * xgrid / (W - 1) - 1
    if H > 1:
        ygrid = 2 * ygrid / (H - 1) - 1
    grid = torch.cat([xgrid, ygrid], dim=-1)
    return F.grid_sample(img_nchw, grid, align_corners=True)


def test_bilinear_sample_matches_grid_sample(rng):
    b, h, w, c = 2, 13, 17, 3
    img = rng.normal(size=(b, h, w, c)).astype(np.float32)
    # coords straddling borders and out-of-range to exercise zero padding
    coords = rng.uniform(-2, max(h, w) + 1, size=(b, 9, 11, 2)).astype(np.float32)

    ours = sampling.bilinear_sample(jnp.asarray(img), jnp.asarray(coords))

    ref = _torch_bilinear_sampler(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(coords))
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_interpolate_bilinear_matches_torch(rng):
    img = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    ours = sampling.interpolate_bilinear(jnp.asarray(img), 16, 16,
                                         align_corners=True)
    ref = F.interpolate(torch.from_numpy(img).permute(0, 3, 1, 2),
                        size=(16, 16), mode="bilinear", align_corners=True)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_avg_pool_matches_torch(rng):
    x = rng.normal(size=(2, 10, 10, 5)).astype(np.float32)
    ours = sampling.avg_pool_2d(jnp.asarray(x), window=3, stride=2, padding=1)
    ref = F.avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 3,
                       stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_convex_upsample_matches_reference_math(rng):
    """Mirror of upsample_flow (reference core/raft_stereo_human.py:69-81)."""
    b, h, w, d, factor = 2, 4, 5, 2, 8
    flow = rng.normal(size=(b, h, w, d)).astype(np.float32)
    mask = rng.normal(size=(b, h, w, 9 * factor * factor)).astype(np.float32)

    ours = sampling.convex_upsample(jnp.asarray(flow), jnp.asarray(mask),
                                    factor)

    tflow = torch.from_numpy(flow).permute(0, 3, 1, 2)
    tmask = torch.from_numpy(mask).permute(0, 3, 1, 2)
    tmask = tmask.view(b, 1, 9, factor, factor, h, w)
    tmask = torch.softmax(tmask, dim=2)
    up_flow = F.unfold(factor * tflow, [3, 3], padding=1)
    up_flow = up_flow.view(b, d, 9, 1, 1, h, w)
    up_flow = torch.sum(tmask * up_flow, dim=2)
    up_flow = up_flow.permute(0, 1, 4, 2, 5, 3)
    ref = up_flow.reshape(b, d, factor * h, factor * w)

    np.testing.assert_allclose(np.asarray(ours),
                               ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def _torch_corr_pyramid_lookup(fmap1, fmap2, coords_x, num_levels, radius):
    """CorrBlock1D (reference core/corr.py:110-156) as an oracle."""
    B, D, H, W1 = fmap1.shape
    corr = torch.einsum("aijk,aijh->ajkh", fmap1, fmap2)
    corr = corr.reshape(B, H, W1, 1, W1) / torch.sqrt(torch.tensor(float(D)))
    batch, h1, w1, _, w2 = corr.shape
    corr = corr.reshape(batch * h1 * w1, 1, 1, w2)
    pyramid = [corr]
    for _ in range(num_levels):
        corr = F.avg_pool2d(corr, [1, 2], stride=[1, 2])
        pyramid.append(corr)

    out_pyramid = []
    for i in range(num_levels):
        c = pyramid[i]
        dx = torch.linspace(-radius, radius, 2 * radius + 1).view(-1, 1)
        x0 = dx + coords_x.reshape(batch * h1 * w1, 1, 1, 1) / 2 ** i
        y0 = torch.zeros_like(x0)
        coords_lvl = torch.cat([x0, y0], dim=-1)
        c = _torch_bilinear_sampler(c, coords_lvl)
        out_pyramid.append(c.view(batch, h1, w1, -1))
    return torch.cat(out_pyramid, dim=-1)


def test_corr_pyramid_lookup_matches_reference(rng):
    b, h, w, d = 2, 6, 32, 16
    f1 = rng.normal(size=(b, h, w, d)).astype(np.float32)
    f2 = rng.normal(size=(b, h, w, d)).astype(np.float32)
    coords = rng.uniform(-3, w + 3, size=(b, h, w)).astype(np.float32)

    pyr = corr_ops.build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2),
                                      num_levels=4)
    ours = corr_ops.lookup_corr_pyramid(pyr, jnp.asarray(coords), radius=4)

    ref = _torch_corr_pyramid_lookup(
        torch.from_numpy(f1).permute(0, 3, 1, 2),
        torch.from_numpy(f2).permute(0, 3, 1, 2),
        torch.from_numpy(coords), num_levels=4, radius=4)

    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-4)


def test_corr_lookup_is_differentiable(rng):
    b, h, w, d = 1, 4, 16, 8
    f1 = jnp.asarray(rng.normal(size=(b, h, w, d)), jnp.float32)
    f2 = jnp.asarray(rng.normal(size=(b, h, w, d)), jnp.float32)
    coords = jnp.asarray(rng.uniform(0, w, size=(b, h, w)), jnp.float32)

    def loss(f1, f2):
        pyr = corr_ops.build_corr_pyramid(f1, f2, num_levels=2)
        out = corr_ops.lookup_corr_pyramid(pyr, coords, radius=2)
        return jnp.sum(out ** 2)

    g1, g2 = jax.grad(loss, argnums=(0, 1))(f1, f2)
    assert np.isfinite(np.asarray(g1)).all()
    assert np.isfinite(np.asarray(g2)).all()
    assert float(jnp.abs(g1).sum()) > 0 and float(jnp.abs(g2).sum()) > 0
