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

# All per-Gaussian 3x3/4x4 contractions are written ELEMENTWISE on purpose:
# batched tiny matmuls lower to MXU ops with terrible utilisation (measured
# 267 ms for 2M Gaussians), while the expanded form is pure VPU f32 and
# memory-bound.  This also sidesteps the TPU's default bf16 matmul
# precision, which visibly shifts mean2d/conics.


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


def build_cov3d_rows(rot: jnp.ndarray, scale: jnp.ndarray):
    """Sigma = R diag(s^2) R^T; returns the 6 unique entries as (N,) vectors
    (s00, s01, s02, s11, s12, s22), fully elementwise."""
    R = quat_to_rotmat(rot)              # (N, 3, 3)
    M = R * scale[..., None, :]          # R @ diag(s)
    m = [[M[..., i, k] for k in range(3)] for i in range(3)]

    def dot(i, j):
        return m[i][0] * m[j][0] + m[i][1] * m[j][1] + m[i][2] * m[j][2]

    return dot(0, 0), dot(0, 1), dot(0, 2), dot(1, 1), dot(1, 2), dot(2, 2)


def build_cov3d(rot: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Sigma = R diag(s^2) R^T, (N, 3, 3) (test/reference convenience)."""
    s00, s01, s02, s11, s12, s22 = build_cov3d_rows(rot, scale)
    return jnp.stack([
        jnp.stack([s00, s01, s02], -1),
        jnp.stack([s01, s11, s12], -1),
        jnp.stack([s02, s12, s22], -1)], axis=-2)


def project_gaussians(xyz: jnp.ndarray, rot: jnp.ndarray, scale: jnp.ndarray,
                      opacity: jnp.ndarray, color: jnp.ndarray,
                      valid: jnp.ndarray, view: jnp.ndarray,
                      proj: jnp.ndarray, tanfovx, tanfovy,
                      height: int, width: int) -> Projected:
    """EWA-project N Gaussians into one camera.  All f32, shapes static."""
    xyz = xyz.astype(jnp.float32)
    n = xyz.shape[0]
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    view = view.astype(jnp.float32)
    proj = proj.astype(jnp.float32)

    def apply44(M, row):
        return M[row, 0] * x + M[row, 1] * y + M[row, 2] * z + M[row, 3]

    tvx = apply44(view, 0)
    tvy = apply44(view, 1)
    tz = apply44(view, 2)
    in_front = tz > 0.2                                     # near cull

    hx = apply44(proj, 0)
    hy = apply44(proj, 1)
    hw = apply44(proj, 3)
    p_w = 1.0 / (hw + 1e-7)
    mean2d = jnp.stack([
        ((hx * p_w + 1.0) * width - 1.0) * 0.5,
        ((hy * p_w + 1.0) * height - 1.0) * 0.5], axis=-1)

    # EWA: cov2d = J Wv Sigma Wv^T J^T with clamped view-space x/y,
    # fully expanded elementwise (see module note)
    s00, s01, s02, s11, s12, s22 = build_cov3d_rows(
        rot.astype(jnp.float32), scale.astype(jnp.float32))
    fx = width / (2.0 * tanfovx)
    fy = height / (2.0 * tanfovy)
    limx = 1.3 * tanfovx
    limy = 1.3 * tanfovy
    tz_safe = jnp.where(in_front, tz, 1.0)
    inv_z = 1.0 / tz_safe
    tx = jnp.clip(tvx * inv_z, -limx, limx) * tz_safe
    ty = jnp.clip(tvy * inv_z, -limy, limy) * tz_safe

    # J rows: [fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z * inv_z
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z * inv_z

    # T = J @ Wv: T[r, k] = J[r, 0] Wv[0k] + J[r, 2] Wv[2k] (row0),
    #                       J[r, 1] Wv[1k] + J[r, 2] Wv[2k] (row1)
    Wv = view[:3, :3]
    t0 = [j00 * Wv[0, k] + j02 * Wv[2, k] for k in range(3)]
    t1 = [j11 * Wv[1, k] + j12 * Wv[2, k] for k in range(3)]

    # U = T @ Sigma (symmetric), cov2d = U @ T^T
    sig = ((s00, s01, s02), (s01, s11, s12), (s02, s12, s22))

    def tsig(t, l):
        return t[0] * sig[0][l] + t[1] * sig[1][l] + t[2] * sig[2][l]

    u0 = [tsig(t0, l) for l in range(3)]
    u1 = [tsig(t1, l) for l in range(3)]
    # EWA low-pass: every splat covers at least ~1 px (CUDA adds 0.3)
    a = u0[0] * t0[0] + u0[1] * t0[1] + u0[2] * t0[2] + 0.3
    b = u0[0] * t1[0] + u0[1] * t1[1] + u0[2] * t1[2]
    c = u1[0] * t1[0] + u1[1] * t1[1] + u1[2] * t1[2] + 0.3

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
