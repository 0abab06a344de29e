"""Per-Gaussian projection to screen space (EWA splatting), differentiable.

TPU-native replacement for the preprocess stage of the external
`diff_gaussian_rasterization` CUDA extension used by the reference
(gaussian_renderer/__init__.py:51-62; SURVEY.md §2.3 N1): quaternion ->
covariance, camera projection, EWA 2D covariance with low-pass, conic +
radius, frustum cull.  Pure vectorized jnp — gradients to xyz/rot/scale flow
via JAX AD, mirroring the hand-written CUDA backward.

Conventions: `view`/`proj` are plain math (column-vector) 4x4 matrices
(NovelCamera); pixel centers sit at integer coordinates, matching the
reference rasterizer's ndc2Pix = ((ndc+1)*S - 1)/2.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

# projection geometry is precision-sensitive: force true-f32 matmuls
# (TPU default is one bf16 pass, which visibly shifts mean2d/conics)
_HI = lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


class Projected(NamedTuple):
    """Screen-space Gaussians, fixed shape (N,...); radius==0 => culled."""

    mean2d: jnp.ndarray   # (N, 2) pixel coords
    conic: jnp.ndarray    # (N, 3) inverse 2D covariance (a, b, c)
    depth: jnp.ndarray    # (N,) camera-space z
    radius: jnp.ndarray   # (N,) float extent in pixels (3 sigma), 0 if culled
    opacity: jnp.ndarray  # (N,)
    color: jnp.ndarray    # (N, 3)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) unit quaternions (w, x, y, z) -> (..., 3, 3) rotations."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)


def build_cov3d(rot: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Sigma = R diag(s^2) R^T, (N, 3, 3)."""
    R = quat_to_rotmat(rot)
    M = R * scale[..., None, :]          # R @ diag(s)
    return _mm(M, jnp.swapaxes(M, -1, -2))


def project_gaussians(xyz: jnp.ndarray, rot: jnp.ndarray, scale: jnp.ndarray,
                      opacity: jnp.ndarray, color: jnp.ndarray,
                      valid: jnp.ndarray, view: jnp.ndarray,
                      proj: jnp.ndarray, tanfovx, tanfovy,
                      height: int, width: int) -> Projected:
    """EWA-project N Gaussians into one camera.  All f32, shapes static."""
    xyz = xyz.astype(jnp.float32)
    n = xyz.shape[0]
    ones = jnp.ones((n, 1), jnp.float32)
    hom = jnp.concatenate([xyz, ones], axis=-1)            # (N, 4)

    p_view = _mm(hom, view.T)                               # (N, 4)
    tz = p_view[:, 2]
    in_front = tz > 0.2                                     # near cull

    p_hom = _mm(hom, proj.T)                                # (N, 4)
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    ndc = p_hom[:, :3] * p_w[:, None]
    mean2d = jnp.stack([
        ((ndc[:, 0] + 1.0) * width - 1.0) * 0.5,
        ((ndc[:, 1] + 1.0) * height - 1.0) * 0.5], axis=-1)

    # EWA: cov2d = J Wv Sigma Wv^T J^T with clamped view-space x/y
    cov3d = build_cov3d(rot.astype(jnp.float32), scale.astype(jnp.float32))
    fx = width / (2.0 * tanfovx)
    fy = height / (2.0 * tanfovy)
    limx = 1.3 * tanfovx
    limy = 1.3 * tanfovy
    tz_safe = jnp.where(in_front, tz, 1.0)
    txtz = jnp.clip(p_view[:, 0] / tz_safe, -limx, limx)
    tytz = jnp.clip(p_view[:, 1] / tz_safe, -limy, limy)
    tx = txtz * tz_safe
    ty = tytz * tz_safe

    zero = jnp.zeros_like(tz_safe)
    J = jnp.stack([
        jnp.stack([fx / tz_safe, zero, -fx * tx / (tz_safe * tz_safe)], -1),
        jnp.stack([zero, fy / tz_safe, -fy * ty / (tz_safe * tz_safe)], -1),
    ], axis=-2)                                             # (N, 2, 3)
    Wv = view[:3, :3]                                       # (3, 3)
    T = _mm(J, Wv)                                          # (N, 2, 3)
    cov2d = _mm(_mm(T, cov3d), jnp.swapaxes(T, -1, -2))     # (N, 2, 2)
    # EWA low-pass: every splat covers at least ~1 px (CUDA adds 0.3)
    a = cov2d[:, 0, 0] + 0.3
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1] + 0.3

    det = a * c - b * b
    det_ok = det > 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    lam1 = mid + disc
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)))

    keep = in_front & det_ok & (valid.reshape(n) > 0.5)
    radius = jnp.where(keep, radius, 0.0)
    # culled entries get harmless finite values everywhere
    mean2d = jnp.where(keep[:, None], mean2d, -1e4)
    conic = jnp.where(keep[:, None], conic, 0.0)

    return Projected(
        mean2d=mean2d, conic=conic, depth=tz,
        radius=lax.stop_gradient(radius),
        opacity=opacity.reshape(n).astype(jnp.float32),
        color=color.astype(jnp.float32))
