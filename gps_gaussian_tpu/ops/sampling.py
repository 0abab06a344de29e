"""Grid sampling, flow grids, pooling and convex upsampling (NHWC, jnp).

Covers the capability of the reference's core/utils/utils.py (coords_grid,
bilinear_sampler == grid_sample(align_corners=True, zero padding)) and the
convex ×8 flow upsampling of core/raft_stereo_human.py:69-81, re-expressed
for TPU: channel-last layouts, gather-based sampling (XLA lowers to
vectorized dynamic-gathers), no data-dependent shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def coords_grid(batch: int, h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """(B, H, W, 2) integer pixel coordinate grid, channels (x, y).

    Same integer convention as the reference's coords_grid
    (core/utils/utils.py:77-80) — NOT the half-pixel-center grid used by the
    unprojection (see geometry/pointcloud.pixel_center_grid).
    """
    y = jnp.arange(h, dtype=dtype)
    x = jnp.arange(w, dtype=dtype)
    xx, yy = jnp.meshgrid(x, y)
    grid = jnp.stack([xx, yy], axis=-1)  # (H, W, 2)
    return jnp.broadcast_to(grid[None], (batch, h, w, 2))


def bilinear_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample an NHWC image at pixel coordinates, zero padding.

    Semantics of the reference bilinear_sampler (core/utils/utils.py:59-75):
    integer coordinates hit pixel centers (align_corners=True) and taps
    outside the image contribute zero (grid_sample's default zero padding).

    Args:
      img: (B, H, W, C).
      coords: (B, ..., 2) with channels (x, y) in pixel units.
    Returns (B, ..., C).
    """
    b, h, w, c = img.shape
    lead = coords.shape[1:-1]
    coords = coords.reshape(b, -1, 2)
    x, y = coords[..., 0], coords[..., 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def tap(yy, xx):
        inside = ((xx >= 0) & (xx <= w - 1) & (yy >= 0) & (yy <= h - 1))
        xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        flat = yi * w + xi                                  # (B, N)
        vals = jnp.take_along_axis(img.reshape(b, h * w, c),
                                   flat[..., None], axis=1)  # (B, N, C)
        return vals * inside[..., None].astype(img.dtype)

    fx = fx[..., None]
    fy = fy[..., None]
    out = (tap(y0, x0) * (1 - fx) * (1 - fy)
           + tap(y0, x0 + 1) * fx * (1 - fy)
           + tap(y0 + 1, x0) * (1 - fx) * fy
           + tap(y0 + 1, x0 + 1) * fx * fy)
    return out.reshape((b,) + lead + (c,))


def interpolate_bilinear(img: jnp.ndarray, out_h: int, out_w: int,
                         align_corners: bool = True) -> jnp.ndarray:
    """Resize an NHWC image bilinearly (F.interpolate equivalent)."""
    b, h, w, c = img.shape
    if align_corners and out_h > 1 and out_w > 1:
        ys = jnp.linspace(0.0, h - 1.0, out_h)
        xs = jnp.linspace(0.0, w - 1.0, out_w)
    else:
        # half-pixel convention
        ys = (jnp.arange(out_h) + 0.5) * (h / out_h) - 0.5
        xs = (jnp.arange(out_w) + 0.5) * (w / out_w) - 0.5
        ys = jnp.clip(ys, 0, h - 1)
        xs = jnp.clip(xs, 0, w - 1)
    xx, yy = jnp.meshgrid(xs, ys)
    coords = jnp.broadcast_to(jnp.stack([xx, yy], axis=-1)[None],
                              (b, out_h, out_w, 2))
    return bilinear_sample(img, coords)


def avg_pool_2d(x: jnp.ndarray, window: int, stride: int,
                padding: int) -> jnp.ndarray:
    """Count-include-pad average pooling over NHWC spatial dims.

    Matches F.avg_pool2d's default (count_include_pad=True), used by the
    reference's pool2x/pool4x (core/update.py:91-95).
    """
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)))
    return summed / float(window * window)


def avg_pool_lastdim(x: jnp.ndarray) -> jnp.ndarray:
    """Average-pool the last axis by 2 (corr pyramid builder)."""
    n = x.shape[-1] // 2
    return x[..., : 2 * n].reshape(x.shape[:-1] + (n, 2)).mean(axis=-1)


def shift_patches_3x3(x: jnp.ndarray) -> jnp.ndarray:
    """The 9 zero-padded 3x3 neighborhood shifts of an NHWC map.

    Equivalent of F.unfold(x, [3,3], padding=1): output (B, H, W, 9, C) with
    taps ordered row-major (dy, dx) in {-1,0,1}².
    """
    b, h, w, c = x.shape
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [padded[:, dy:dy + h, dx:dx + w] for dy in range(3)
            for dx in range(3)]
    return jnp.stack(taps, axis=3)


def convex_upsample(flow: jnp.ndarray, mask_logits: jnp.ndarray,
                    factor: int = 8) -> jnp.ndarray:
    """Learned convex ×factor upsampling of a flow field.

    Reimplements the reference's upsample_flow
    (core/raft_stereo_human.py:69-81): softmax over 9 logits selects a convex
    combination of the 3x3 neighborhood of `factor * flow` for each of the
    factor² subpixels.

    Args:
      flow: (B, h, w, D) coarse flow.
      mask_logits: (B, h, w, 9 * factor²) from the mask head.
    Returns (B, h*factor, w*factor, D).
    """
    b, h, w, d = flow.shape
    f2 = factor * factor
    mask = mask_logits.reshape(b, h, w, 9, f2)
    mask = jax.nn.softmax(mask, axis=3)

    patches = shift_patches_3x3(flow * factor)          # (B, h, w, 9, D)
    up = jnp.einsum("bhwkf,bhwkd->bhwfd", mask, patches)  # (B, h, w, f2, D)
    up = up.reshape(b, h, w, factor, factor, d)
    # (B, h, fy, w, fx, D) -> (B, h*factor, w*factor, D)
    up = up.transpose(0, 1, 3, 2, 4, 5)
    return up.reshape(b, h * factor, w * factor, d)
