"""All-pairs 1D correlation volume + pyramid lookup (RAFT-Stereo style).

TPU-native equivalent of the reference's core/corr.py (CorrBlock1D /
CorrBlockFast1D + the external `corr_sampler` CUDA extension, SURVEY.md §2.3
N2).  The volume build is a single batched MXU matmul; the pyramid is a
mean-pool over the disparity axis; the 9-tap lookup is a vectorized gather
with linear interpolation, fully differentiable (XLA emits the
scatter-add backward that the CUDA extension hand-writes).

Layout: feature maps are channel-last (B, H, W, D); the volume is
(B, H, W1, W2) — W2 (the disparity/search axis) last, so pooling and lookup
ride the TPU lane dimension.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from jax import lax

from gps_gaussian_tpu.ops.sampling import avg_pool_lastdim


def build_corr_volume(fmap1: jnp.ndarray, fmap2: jnp.ndarray) -> jnp.ndarray:
    """All-pairs correlation along rows: (B, H, W1, W2) / sqrt(D).

    Math of reference core/corr.py:149-156 (CorrBlock1D.corr, the einsum
    'aijk,aijh->ajkh').  One MXU contraction per row; accumulate in f32.
    """
    d = fmap1.shape[-1]
    corr = jnp.einsum(
        "bhwd,bhvd->bhwv",
        fmap1.astype(jnp.float32), fmap2.astype(jnp.float32),
        precision=lax.Precision.HIGHEST)
    return corr / jnp.sqrt(jnp.float32(d))


def build_corr_pyramid(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                       num_levels: int = 4) -> list[jnp.ndarray]:
    """Volume + (num_levels-1) 2x mean-pools of the disparity axis.

    Matches reference core/corr.py:120-125 lookups: level i has W2/2^i bins.
    """
    corr = build_corr_volume(fmap1, fmap2)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = avg_pool_lastdim(corr)
        pyramid.append(corr)
    return pyramid


def _sample_lastdim(vol: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Linear sampling of (B, H, W, S) along S at x (B, H, W, T), zero pad.

    Align-corners semantics: integer x hits bin centers; taps outside
    [0, S-1] contribute zero — identical to the grid_sample call in the
    reference's lookup (core/corr.py:139-145 via bilinear_sampler).

    TPU formulation: a per-pixel gather along the minor (lane) axis is a
    dynamic lane shuffle — the slowest possible addressing pattern (it
    was ~70 ms of the 1024^2 forward).  S is small (<= W/8 = 128-ish), so
    linear interpolation is instead computed DENSELY: a triangle-kernel
    weight over the whole S axis contracted by a sum — pure elementwise
    VPU work that XLA fuses into the reduction, with a dense backward
    (no scatter-add) for free.
    """
    sgrid = jnp.arange(vol.shape[-1], dtype=vol.dtype)
    base = x.astype(vol.dtype)[..., None] - sgrid       # (B, H, W, T, S)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(base))
    return jnp.sum(vol[..., None, :] * w, axis=-1)


def lookup_corr_pyramid(pyramid: Sequence[jnp.ndarray], coords_x: jnp.ndarray,
                        radius: int = 4) -> jnp.ndarray:
    """Gather 2r+1 taps around coords/2^i from every level.

    Equivalent of CorrBlock1D.__call__ / the corr_sampler CUDA kernel
    (reference core/corr.py:129-147, 17-29).

    Args:
      pyramid: list of (B, H, W, S_i) volumes.
      coords_x: (B, H, W) absolute x coordinate in view-2 (full res of W).
      radius: taps per level = 2*radius + 1.
    Returns (B, H, W, num_levels * (2*radius+1)), f32, ordered level-major
    with taps from -r to +r (the reference's channel order).
    """
    taps = jnp.arange(-radius, radius + 1, dtype=coords_x.dtype)
    out = []
    for i, vol in enumerate(pyramid):
        x = coords_x[..., None] / (2 ** i) + taps  # (B, H, W, 2r+1)
        out.append(_sample_lastdim(vol, x))
    return jnp.concatenate(out, axis=-1).astype(jnp.float32)
