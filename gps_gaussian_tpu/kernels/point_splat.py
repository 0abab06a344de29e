"""Non-differentiable nearest-pixel point splat with inverse-z test.

TPU-native equivalent of the reference's Taichi preview renderer
(lib/TaichiRender.py:13-24; SURVEY.md §2.3 N3): project points, round to
the nearest pixel, keep the nearest surface via a scatter-max on inverse
depth.  Used for stage-1 validation previews only — the real renderer is
kernels/rasterizer.
"""

from __future__ import annotations

import jax.numpy as jnp


def splat_points(xyz: jnp.ndarray, rgb: jnp.ndarray, valid: jnp.ndarray,
                 intr: jnp.ndarray, extr: jnp.ndarray,
                 height: int, width: int) -> jnp.ndarray:
    """xyz (B,N,3), rgb (B,N,3) in [0,1], valid (B,N), intr (B,3,3),
    extr (B,3,4) -> (B, H, W, 3) image (black background)."""
    calib = jnp.einsum("bij,bjk->bik", intr, extr)          # (B, 3, 4)
    p = (jnp.einsum("bij,bnj->bni", calib[:, :, :3], xyz)
         + calib[:, :, 3][:, None, :])                       # (B, N, 3)
    z = p[..., 2]
    u = jnp.round(p[..., 0] / z).astype(jnp.int32)
    v = jnp.round(p[..., 1] / z).astype(jnp.int32)

    ok = ((valid > 0.5) & (z > 1e-6) & (u >= 0) & (u < width)
          & (v >= 0) & (v < height))
    inv_z = jnp.where(ok, 1.0 / jnp.maximum(z, 1e-6), 0.0)
    flat = jnp.where(ok, v * width + u, height * width)      # sentinel slot

    def one(inv_z, flat, rgb):
        zbuf = jnp.zeros(height * width + 1, jnp.float32)
        zbuf = zbuf.at[flat].max(inv_z)
        win = (inv_z > 0) & (inv_z >= zbuf[flat])
        img = jnp.zeros((height * width + 1, 3), jnp.float32)
        img = img.at[jnp.where(win, flat, height * width)].set(rgb)
        return img[: height * width].reshape(height, width, 3)

    import jax
    return jax.vmap(one)(inv_z, flat, rgb)
