"""flow <-> disparity <-> inverse-depth <-> world points (fixed-shape jnp).

Reimplements the geometry of reference lib/utils.py:88-128 (depth2pc,
flow2depth, perspective) and lib/human_loader.py:30-61 (depth2pts,
pts2depth).  CRITICAL CONVENTION: every "depth" array is INVERSE z (1/z)
throughout, exactly as in the reference (SURVEY.md §3.5).

All functions are batched, jit-safe and differentiable.  Image-shaped arrays
are (..., H, W) or (..., H, W, C) — channel-last.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# Geometry is precision-sensitive: force fp32 MXU passes for the tiny 3x3
# contractions here (TPU matmuls default to bf16 inputs otherwise).
_HIGHEST = lax.Precision.HIGHEST


def pixel_center_grid(h: int, w: int, dtype=jnp.float32):
    """(H, W, 2) grid of (x, y) pixel centers at half-integer offsets.

    Matches torch.linspace(0.5, S-0.5, S) used by the unprojection in
    reference lib/utils.py:94 — NOTE this differs from RAFT's integer
    `coords_grid` (core/utils/utils.py:77-80), which is in ops/sampling.py.
    """
    y = jnp.linspace(0.5, h - 0.5, h, dtype=dtype)
    x = jnp.linspace(0.5, w - 0.5, w, dtype=dtype)
    xx, yy = jnp.meshgrid(x, y)  # (H, W) each
    return jnp.stack([xx, yy], axis=-1)


def inv_depth_to_points(inv_depth: jnp.ndarray, extr: jnp.ndarray,
                        intr: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel unprojection to world points.

    Equivalent of reference lib/utils.py:88-110 (depth2pc) /
    lib/human_loader.py:30-50 (depth2pts):
        z = 1 / (inv_depth + 1e-8)
        x = (u - cx) * z / fx ;  y = (v - cy) * z / fy
        world = R^T (p_cam - t)

    Args:
      inv_depth: (B, H, W) inverse depth (0 outside the foreground).
      extr: (B, 3, 4) world->cam [R|t].
      intr: (B, 3, 3).
    Returns (B, H, W, 3) world points.
    """
    b, h, w = inv_depth.shape
    grid = pixel_center_grid(h, w, inv_depth.dtype)  # (H, W, 2)
    z = 1.0 / (inv_depth + 1e-8)                      # (B, H, W)

    fx = intr[:, 0, 0][:, None, None]
    fy = intr[:, 1, 1][:, None, None]
    cx = intr[:, 0, 2][:, None, None]
    cy = intr[:, 1, 2][:, None, None]

    x = (grid[..., 0][None] - cx) * z / fx
    y = (grid[..., 1][None] - cy) * z / fy
    p_cam = jnp.stack([x, y, z], axis=-1)             # (B, H, W, 3)

    R = extr[:, :3, :3]                               # (B, 3, 3)
    t = extr[:, :3, 3]                                # (B, 3)
    # world = R^T @ (p - t): contract camera-space points with R (not R^T)
    # on the left index: world_i = sum_j R_ji (p_j - t_j)
    p_rel = p_cam - t[:, None, None, :]
    return jnp.einsum("bji,bhwj->bhwi", R, p_rel, precision=_HIGHEST)


def points_to_inv_depth(pts: jnp.ndarray, extr: jnp.ndarray,
                        intr: jnp.ndarray) -> jnp.ndarray:
    """World point map -> inverse depth in the given camera.

    Equivalent of reference lib/human_loader.py:53-61 (pts2depth).

    Args:
      pts: (B, H, W, 3) world points.
      extr: (B, 3, 4); intr: (B, 3, 3).
    Returns (B, H, W) inverse depth 1/(z + 1e-8).
    """
    R = extr[:, :3, :3]
    t = extr[:, :3, 3]
    p_cam = jnp.einsum("bij,bhwj->bhwi", R, pts,
                       precision=_HIGHEST) + t[:, None, None, :]
    # K's third row is [0, 0, 1] so z is unchanged by the intrinsics.
    return 1.0 / (p_cam[..., 2] + 1e-8)


def flow_to_inv_depth(flow: jnp.ndarray, intr: jnp.ndarray,
                      ref_intr: jnp.ndarray, tf_x: jnp.ndarray,
                      mask: jnp.ndarray) -> jnp.ndarray:
    """Disparity-flow -> inverse depth (reference lib/utils.py:113-120).

        offset    = ref_cx - cx
        disparity = offset - flow
        inv_depth = -disparity / Tf_x, zeroed outside the mask

    Args:
      flow: (B, H, W, 1) predicted flow (x-displacement).
      intr, ref_intr: (B, 3, 3) this/other view's rectified intrinsics.
      tf_x: (B,) signed baseline term.
      mask: (B, H, W, 1) foreground mask.
    Returns (B, H, W, 1) inverse depth.
    """
    offset = ref_intr[:, 0, 2] - intr[:, 0, 2]             # (B,)
    disparity = offset[:, None, None, None] - flow
    inv_depth = -disparity / tf_x[:, None, None, None]
    return inv_depth * mask


def perspective_project(pts: jnp.ndarray, calib: jnp.ndarray) -> jnp.ndarray:
    """Project world points with a 3x4 calib = K @ [R|t].

    Equivalent of reference lib/utils.py:122-128 (perspective): returns
    (..., 3) with (u, v, z_cam) — xy divided by depth, z untouched.

    Args:
      pts: (B, N, 3); calib: (B, 3, 4).
    """
    p = jnp.einsum("bij,bnj->bni", calib[:, :3, :3], pts,
                   precision=_HIGHEST) + calib[:, :3, 3][:, None, :]
    xy = p[..., :2] / p[..., 2:3]
    return jnp.concatenate([xy, p[..., 2:3]], axis=-1)


def stereo_flow_from_inv_depth(inv_depth: jnp.ndarray, intr: jnp.ndarray,
                               ref_intr: jnp.ndarray,
                               tf_x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of flow_to_inv_depth — builds GT flow from rectified inv-depth.

    Mirrors reference lib/human_loader.py:74-80 (stereo_pts2flow):
        disparity = -inv_depth * Tf_x ;  flow = offset - disparity

    Args:
      inv_depth: (B, H, W, 1); intr/ref_intr: (B, 3, 3); tf_x: (B,).
    Returns (B, H, W, 1) flow.
    """
    offset = ref_intr[:, 0, 2] - intr[:, 0, 2]
    disparity = -inv_depth * tf_x[:, None, None, None]
    return offset[:, None, None, None] - disparity
