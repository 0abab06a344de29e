"""Slow exact oracle: per-pixel alpha compositing over ALL Gaussians.

Differentiable jnp implementation of the reference rasterizer's forward
semantics (external diff_gaussian_rasterization CUDA; SURVEY.md §2.3 N1),
including the alpha tests (power <= 0, alpha >= 1/255, clamp at 0.99) and
the front-to-back early-termination rule (a Gaussian whose blend would push
transmittance below 1e-4 is dropped along with everything behind it).

O(pixels x N) — use only for tests/small scenes; production path is
binning + tiled composite.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from gps_gaussian_tpu.kernels.rasterizer.preprocess import Projected

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def composite_reference(proj: Projected, bg_color: jnp.ndarray,
                        height: int, width: int,
                        tile: int = 16) -> jnp.ndarray:
    """Depth-sort all N Gaussians and over-composite per pixel.

    A Gaussian contributes only to pixels whose tile lies inside its
    radius rectangle — the same 3-sigma tile cull the CUDA rasterizer's
    duplicateWithKeys applies, which truncates faint tails that would still
    pass the 1/255 alpha test.

    Returns (H, W, 3) image.
    """
    n = proj.depth.shape[0]
    live = proj.radius > 0.0
    radius = proj.radius
    # stable depth order with culled Gaussians pushed to the back
    sort_key = jnp.where(live, proj.depth, jnp.inf)
    order = jnp.argsort(sort_key)
    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    opacity = proj.opacity[order]
    color = proj.color[order]
    live = live[order]
    radius = radius[order]

    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    xx, yy = jnp.meshgrid(xs, ys)
    pix = jnp.stack([xx, yy], axis=-1).reshape(-1, 2)        # (P, 2)

    d = pix[:, None, :] - mean2d[None, :, :]                 # (P, N, 2)
    dx, dy = d[..., 0], d[..., 1]
    a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]
    power = (-0.5 * (a[None] * dx * dx + c[None] * dy * dy)
             - b[None] * dx * dy)                            # (P, N)

    # tile-rectangle cull (matches binning.bin_gaussians)
    tiles_x = -(-width // tile)
    tiles_y = -(-height // tile)
    x_min = jnp.clip(jnp.floor((mean2d[:, 0] - radius) / tile), 0, tiles_x)
    x_max = jnp.clip(jnp.floor((mean2d[:, 0] + radius + tile - 1) / tile),
                     0, tiles_x)
    y_min = jnp.clip(jnp.floor((mean2d[:, 1] - radius) / tile), 0, tiles_y)
    y_max = jnp.clip(jnp.floor((mean2d[:, 1] + radius + tile - 1) / tile),
                     0, tiles_y)
    ptx = jnp.floor(pix[:, 0] / tile)
    pty = jnp.floor(pix[:, 1] / tile)
    in_rect = ((ptx[:, None] >= x_min[None]) & (ptx[:, None] < x_max[None])
               & (pty[:, None] >= y_min[None]) & (pty[:, None] < y_max[None]))

    alpha = jnp.minimum(ALPHA_MAX, opacity[None] * jnp.exp(power))
    include = (live[None] & in_rect & (power <= 0.0)
               & (alpha >= ALPHA_MIN))
    alpha = jnp.where(include, alpha, 0.0)

    # exclusive front-to-back transmittance
    log1m = jnp.log1p(-alpha)
    t_excl = jnp.exp(jnp.cumsum(log1m, axis=1) - log1m)      # (P, N)

    # early termination: first included Gaussian whose blend would push
    # T below 1e-4 is dropped together with everything behind it
    viol = include & (t_excl * (1.0 - alpha) < T_EPS)
    blend = include & (jnp.cumsum(viol.astype(jnp.int32), axis=1) == 0)

    w = jnp.where(blend, alpha * t_excl, 0.0)                # (P, N)
    img = w @ color                                          # (P, 3)
    t_final = jnp.exp(jnp.sum(jnp.where(blend, log1m, 0.0), axis=1))
    img = img + t_final[:, None] * bg_color[None, :]
    return img.reshape(height, width, 3)
