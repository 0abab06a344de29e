"""Tiled alpha compositing in pure jnp (fallback path + pallas oracle).

Same math as reference.py's oracle but restricted to each tile's sorted
Gaussian segment (static per-tile cap).  Differentiable via JAX AD; used on
CPU, in tests, and as the allclose target for the Pallas kernel.

The compositing order is expressed as an exclusive cumulative product of
(1 - alpha) along the depth-sorted axis — an associative form the TPU can
vectorize — instead of the CUDA kernel's sequential per-pixel walk.
"""

from __future__ import annotations

import jax.numpy as jnp

from jax import lax

from gps_gaussian_tpu.kernels.rasterizer.reference import (ALPHA_MAX,
                                                           ALPHA_MIN, T_EPS)


def composite_tiles(mean2d_s, conic_s, opacity_s, color_s, live_s,
                    tile_start, tile_count, height: int, width: int,
                    bg_color, tile: int = 16, max_per_tile: int = 1024):
    """Composite sorted per-pair Gaussians into an image.

    Args:
      *_s: pair-sorted properties, shapes (P, ...) — output of binning +
        gather.  live_s (P,) marks real pairs (False = padding).
      tile_start, tile_count: (T,) per-tile segment ranges.
      bg_color: (3,).
    Returns (image (H, W, 3), transmittance (H, W, 1)).
    """
    tiles_x = -(-width // tile)
    tiles_y = -(-height // tile)
    num_tiles = tiles_x * tiles_y
    m = max_per_tile
    p_total = mean2d_s.shape[0]

    # (T, M) gather indices into the sorted pair arrays
    j = jnp.arange(m, dtype=jnp.int32)
    idx = tile_start[:, None] + j[None, :]
    in_seg = j[None, :] < jnp.minimum(tile_count, m)[:, None]
    idx = jnp.clip(idx, 0, p_total - 1)

    mean2d = mean2d_s[idx]                     # (T, M, 2)
    conic = conic_s[idx]                       # (T, M, 3)
    opacity = jnp.where(in_seg, opacity_s[idx], 0.0)
    color = color_s[idx]                       # (T, M, 3)
    live = in_seg & live_s[idx]

    # per-tile pixel coordinates (T, px, 2)
    t = jnp.arange(num_tiles, dtype=jnp.int32)
    tx0 = (t % tiles_x) * tile
    ty0 = (t // tiles_x) * tile
    k = jnp.arange(tile * tile, dtype=jnp.int32)
    px = (tx0[:, None] + k[None, :] % tile).astype(jnp.float32)
    py = (ty0[:, None] + k[None, :] // tile).astype(jnp.float32)

    dx = px[:, None, :] - mean2d[..., 0:1]     # (T, M, px)
    dy = py[:, None, :] - mean2d[..., 1:2]
    a = conic[..., 0:1]
    b = conic[..., 1:2]
    c = conic[..., 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy

    alpha = jnp.minimum(ALPHA_MAX, opacity[..., None] * jnp.exp(power))
    include = live[..., None] & (power <= 0.0) & (alpha >= ALPHA_MIN)
    alpha = jnp.where(include, alpha, 0.0)

    log1m = jnp.log1p(-alpha)
    t_excl = jnp.exp(jnp.cumsum(log1m, axis=1) - log1m)     # (T, M, px)
    viol = include & (t_excl * (1.0 - alpha) < T_EPS)
    blend = include & (jnp.cumsum(viol.astype(jnp.int32), axis=1) == 0)

    w = jnp.where(blend, alpha * t_excl, 0.0)
    img_tiles = jnp.einsum("tmp,tmc->tpc", w, color,
                           precision=lax.Precision.HIGHEST)  # (T, px, 3)
    t_final = jnp.exp(jnp.sum(jnp.where(blend, log1m, 0.0), axis=1))
    img_tiles = img_tiles + t_final[..., None] * bg_color[None, None, :]

    # (T, px, C) -> (H, W, C), cropping any padding tiles
    def untile(x, ch):
        x = x.reshape(tiles_y, tiles_x, tile, tile, ch)
        x = x.transpose(0, 2, 1, 3, 4)
        return x.reshape(tiles_y * tile, tiles_x * tile, ch)[
            :height, :width]

    return untile(img_tiles, 3), untile(t_final[..., None], 1)
