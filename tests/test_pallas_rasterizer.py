"""Pallas composite kernel vs the jnp tiled composite: fwd + grad allclose.

Runs the TPU kernel in interpreter mode on CPU (SURVEY.md §4a) over the same
binned scene as the jnp path, through the public rasterize_single dispatch.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gps_gaussian_tpu.geometry import cameras
from gps_gaussian_tpu.kernels.rasterizer import (RasterizeConfig,
                                                 rasterize_single)

RES = 48  # 3x3 tile grid

CFG_J = RasterizeConfig(max_tiles_per_gaussian=16, max_per_tile=512,
                        backend="jnp")
CFG_P = RasterizeConfig(max_tiles_per_gaussian=16, max_per_tile=512,
                        backend="pallas", interpret=True)


def _scene_args(rng, n=300, res=RES):
    K = np.array([[0.8 * res, 0, res / 2],
                  [0, 0.8 * res, res / 2], [0, 0, 1]], np.float32)
    E = np.eye(3, 4, dtype=np.float32)
    E[2, 3] = 2.0
    cam = cameras.camera_from_intr_extr(K, E, res, res)

    xyz = rng.normal(scale=0.3, size=(n, 3)).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    scale = rng.uniform(0.005, 0.06, size=(n, 3)).astype(np.float32)
    opacity = rng.uniform(0.1, 0.95, size=(n, 1)).astype(np.float32)
    color = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    valid = (rng.uniform(size=(n,)) > 0.1).astype(np.float32)
    return ((jnp.asarray(xyz), jnp.asarray(q), jnp.asarray(scale),
             jnp.asarray(opacity), jnp.asarray(color), jnp.asarray(valid),
             jnp.asarray(cam["view"]), jnp.asarray(cam["proj"]),
             cam["tanfovx"], cam["tanfovy"], res, res),
            jnp.asarray([0.1, 0.5, 0.9], jnp.float32))


@pytest.mark.fast
def test_pallas_forward_matches_jnp(rng):
    args, bg = _scene_args(rng)
    img_j, aux_j = rasterize_single(*args, bg, CFG_J)
    img_p, aux_p = rasterize_single(*args, bg, CFG_P)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_j),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(aux_p.transmittance),
                               np.asarray(aux_j.transmittance), atol=1e-5)


def test_pallas_gradients_match_jnp(rng):
    args, bg = _scene_args(rng, n=200)
    xyz, q, scale, opacity, color = args[:5]
    rest = args[5:]
    w_img = jnp.asarray(rng.normal(size=(RES, RES, 3)), jnp.float32)
    w_t = jnp.asarray(rng.normal(size=(RES, RES, 1)), jnp.float32)

    def make_loss(cfg):
        def loss(xyz, q, scale, opacity, color):
            img, aux = rasterize_single(xyz, q, scale, opacity, color,
                                        *rest, bg, cfg)
            return jnp.sum(img * w_img) + jnp.sum(aux.transmittance * w_t)
        return loss

    l_j = float(make_loss(CFG_J)(xyz, q, scale, opacity, color))
    l_p = float(make_loss(CFG_P)(xyz, q, scale, opacity, color))
    np.testing.assert_allclose(l_p, l_j, rtol=1e-5)

    g_j = jax.grad(make_loss(CFG_J), argnums=(0, 1, 2, 3, 4))(
        xyz, q, scale, opacity, color)
    g_p = jax.grad(make_loss(CFG_P), argnums=(0, 1, 2, 3, 4))(
        xyz, q, scale, opacity, color)
    for gj, gp, name in zip(g_j, g_p,
                            ("xyz", "rot", "scale", "opacity", "color")):
        s = np.abs(np.asarray(gj)).max() + 1e-8
        np.testing.assert_allclose(np.asarray(gp) / s, np.asarray(gj) / s,
                                   atol=1e-5, err_msg=name)


def test_pallas_empty_scene(rng):
    args, bg = _scene_args(rng, n=8)
    args = args[:5] + (jnp.zeros((8,)),) + args[6:]   # all masked out
    img, aux = rasterize_single(*args, bg, CFG_P)
    np.testing.assert_allclose(
        np.asarray(img), np.broadcast_to(np.asarray(bg), (RES, RES, 3)),
        atol=1e-6)
    np.testing.assert_allclose(np.asarray(aux.transmittance), 1.0)


def test_batched_fused_matches_per_sample(rng):
    """rasterize() fuses the whole batch through one pair sort + one
    kernel launch; images, gradients, and per-sample drop counters must
    match the single-sample path."""
    import jax
    from gps_gaussian_tpu.geometry import cameras
    from gps_gaussian_tpu.kernels.rasterizer import (RasterizeConfig,
                                                     rasterize,
                                                     rasterize_single)
    from gps_gaussian_tpu.utils.containers import FlatGaussians

    B, N, R = 2, 150, 48
    def mk():
        rot = rng.normal(size=(N, 4)).astype(np.float32)
        rot /= np.linalg.norm(rot, axis=1, keepdims=True)
        return dict(
            xyz=rng.normal(0, 0.25, (N, 3)).astype(np.float32), rot=rot,
            scale=rng.uniform(0.005, 0.05, (N, 3)).astype(np.float32),
            opacity=rng.uniform(0.1, 0.95, (N, 1)).astype(np.float32),
            rgb=rng.uniform(0, 1, (N, 3)).astype(np.float32),
            valid=np.ones((N,), np.float32))
    gs = [mk() for _ in range(B)]
    gauss = FlatGaussians(**{k: jnp.asarray(np.stack([g[k] for g in gs]))
                             for k in gs[0]})
    cams = []
    for b in range(B):
        K = np.array([[0.8 * R, 0, R / 2], [0, 0.8 * R, R / 2],
                      [0, 0, 1]], np.float32)
        E = np.eye(3, 4, dtype=np.float32)
        E[2, 3] = 2.0 + 0.3 * b
        cams.append(cameras.camera_from_intr_extr(K, E, R, R))
    cam = cameras.make_novel_camera(cams, R, R)
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    cfg = RasterizeConfig(backend="pallas", interpret=True, fg_cap=128,
                          max_tiles_per_gaussian=16, max_per_tile=256)

    imgs, aux = rasterize(gauss, cam, bg, cfg)
    for b in range(B):
        img1, aux1 = rasterize_single(
            gauss.xyz[b], gauss.rot[b], gauss.scale[b], gauss.opacity[b],
            gauss.rgb[b], gauss.valid[b], cam.view[b], cam.proj[b],
            cam.tanfovx[b], cam.tanfovy[b], R, R, bg, cfg)
        np.testing.assert_allclose(np.asarray(imgs[b]), np.asarray(img1),
                                   atol=1e-6)
        assert int(aux.num_pair_dropped[b]) == int(aux1.num_pair_dropped)
        assert int(aux.num_fg_dropped[b]) == int(aux1.num_fg_dropped)

    def loss_b(op):
        i, _ = rasterize(gauss.replace(opacity=op), cam, bg, cfg)
        return jnp.sum(i ** 2)

    def loss_s(op):
        tot = 0.0
        for b in range(B):
            i, _ = rasterize_single(
                gauss.xyz[b], gauss.rot[b], gauss.scale[b], op[b],
                gauss.rgb[b], gauss.valid[b], cam.view[b], cam.proj[b],
                cam.tanfovx[b], cam.tanfovy[b], R, R, bg, cfg)
            tot = tot + jnp.sum(i ** 2)
        return tot

    gb = jax.grad(loss_b)(gauss.opacity)
    gs_ = jax.grad(loss_s)(gauss.opacity)
    s = float(jnp.max(jnp.abs(gs_))) + 1e-8
    np.testing.assert_allclose(np.asarray(gb) / s, np.asarray(gs_) / s,
                               atol=1e-5)


@pytest.mark.fast
def test_expand_rect_offsets_exact():
    """f32 floor-division duplicate->tile offsets match integer div/mod
    exactly for every realistic (k, span) combination (the int ops are
    software-emulated on TPU and were ~10 ms at production pair counts)."""
    from gps_gaussian_tpu.kernels.rasterizer.pallas_kernel import \
        expand_rect_offsets

    rng = np.random.default_rng(7)
    for K in (4, 6, 8, 16, 64):
        span = jnp.asarray(
            np.concatenate([np.arange(1, 257),
                            rng.integers(1, 256, size=4096)]
                           ).astype(np.int32))
        dx, dy = jax.jit(expand_rect_offsets, static_argnums=1)(span, K)
        k = np.arange(K)[None, :]
        s = np.asarray(span)[:, None]
        np.testing.assert_array_equal(np.asarray(dy), k // s)
        np.testing.assert_array_equal(np.asarray(dx), k % s)
