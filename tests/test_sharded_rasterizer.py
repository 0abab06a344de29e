"""Tile-sharded multi-chip rendering vs the single-device path.

Runs the pallas kernel (interpret mode) under shard_map on the 8-device
virtual CPU mesh — validating both the band sharding math and that the
Pallas composite compiles/executes under a multi-device mesh (SURVEY.md
§2.4 sequence-parallel analogue; BASELINE config 5).
"""

import numpy as np
import jax
import jax.numpy as jnp

from gps_gaussian_tpu.geometry import cameras
from gps_gaussian_tpu.kernels.rasterizer import (RasterizeConfig,
                                                 rasterize_single)
from gps_gaussian_tpu.kernels.rasterizer.sharded import \
    rasterize_tile_sharded
from gps_gaussian_tpu.train.sharding import make_mesh
from gps_gaussian_tpu.utils.containers import FlatGaussians


def _scene(rng, n):
    rot = rng.normal(size=(n, 4)).astype(np.float32)
    rot /= np.linalg.norm(rot, axis=1, keepdims=True)
    return FlatGaussians(
        xyz=jnp.asarray(rng.normal(0, 0.25, (1, n, 3)), jnp.float32),
        rot=jnp.asarray(rot[None]),
        scale=jnp.asarray(rng.uniform(0.005, 0.05, (1, n, 3)), jnp.float32),
        opacity=jnp.asarray(rng.uniform(0.1, 0.95, (1, n, 1)), jnp.float32),
        rgb=jnp.asarray(rng.uniform(0, 1, (1, n, 3)), jnp.float32),
        valid=jnp.ones((1, n), jnp.float32))


def _camera(res):
    K = np.array([[0.8 * res, 0, res / 2], [0, 0.8 * res, res / 2],
                  [0, 0, 1]], np.float32)
    E = np.eye(3, 4, dtype=np.float32)
    E[2, 3] = 2.0
    cam = cameras.camera_from_intr_extr(K, E, res, res)
    return cameras.make_novel_camera([cam], res, res)


def test_tile_sharded_matches_single_device(rng):
    res, n = 128, 400
    gauss = _scene(rng, n)
    cam = _camera(res)
    bg = jnp.asarray([0.15, 0.1, 0.05], jnp.float32)
    mesh = make_mesh()
    assert mesh.shape["data"] == 8

    # band cap < n exercises the take_rows gather but is generous enough
    # that neither path drops — a global fg_cap that DOES drop is not
    # comparable (each band legitimately keeps its own overlap set)
    cfg = RasterizeConfig(backend="pallas", interpret=True, fg_cap=384,
                          max_tiles_per_gaussian=16, max_per_tile=512)
    img_s, aux_s = rasterize_tile_sharded(gauss, cam, bg, cfg, mesh)
    assert img_s.shape == (1, res, res, 3)
    assert int(aux_s.num_fg_dropped[0]) == 0

    cfg1 = RasterizeConfig(backend="pallas", interpret=True, fg_cap=None,
                           max_tiles_per_gaussian=16, max_per_tile=512)
    img_1, aux_1 = rasterize_single(
        gauss.xyz[0], gauss.rot[0], gauss.scale[0], gauss.opacity[0],
        gauss.rgb[0], gauss.valid[0], cam.view[0], cam.proj[0],
        cam.tanfovx[0], cam.tanfovy[0], res, res, bg, cfg1)

    np.testing.assert_allclose(np.asarray(img_s[0]), np.asarray(img_1),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(aux_s.transmittance[0]),
                               np.asarray(aux_1.transmittance), atol=1e-5)
    assert int(aux_s.num_dropped[0]) == int(aux_1.num_dropped)
    assert int(aux_s.num_pair_dropped[0]) >= 0


def test_tile_sharded_non_divisible_height(rng):
    """H not a multiple of ndev*16: bands pad, output crops back."""
    res, n = 112, 300   # 7 tile rows over 8 devices -> pad to 8
    gauss = _scene(rng, n)
    cam = _camera(res)
    bg = jnp.zeros(3, jnp.float32)
    mesh = make_mesh()
    cfg = RasterizeConfig(backend="pallas", interpret=True,
                          max_tiles_per_gaussian=16, max_per_tile=512)
    img_s, _ = rasterize_tile_sharded(gauss, cam, bg, cfg, mesh)
    img_1, _ = rasterize_single(
        gauss.xyz[0], gauss.rot[0], gauss.scale[0], gauss.opacity[0],
        gauss.rgb[0], gauss.valid[0], cam.view[0], cam.proj[0],
        cam.tanfovx[0], cam.tanfovy[0], res, res, bg, cfg)
    np.testing.assert_allclose(np.asarray(img_s[0]), np.asarray(img_1),
                               atol=1e-5)


def test_sharded_train_step_pallas_matches_single(rng):
    """The shard_map train step (pallas interpret, 8-device mesh) must
    produce the same loss/metrics as the single-device jit step — the
    multi-chip TRAINING path for the Pallas rasterizer (jit's automatic
    partitioner cannot split a pallas_call)."""
    from gps_gaussian_tpu.testing import fake_stereo_batch
    from gps_gaussian_tpu.train import sharding, state as state_lib
    from gps_gaussian_tpu.train.config import load_config
    from gps_gaussian_tpu.train.trainer import (make_model,
                                                make_raster_config,
                                                make_sharded_train_step,
                                                make_train_step)

    cfg = load_config(
        None, batch_size=8,
        raster=dict(max_tiles_per_gaussian=8, max_per_tile=128,
                    backend="pallas"))
    import dataclasses

    rcfg = dataclasses.replace(make_raster_config(cfg), interpret=True)
    mesh = sharding.make_mesh()
    batch = fake_stereo_batch(batch=8, res=32, novel_res=32)

    model = make_model(cfg, with_gs=True)
    params = model.init(jax.random.PRNGKey(0), batch,
                        iters=cfg.raft.train_iters)
    state0 = state_lib.create_state(cfg, params)

    single = jax.jit(make_train_step(model, cfg, "stage2", rcfg))
    s1, m1 = single(state0, batch)

    state0b = state_lib.create_state(cfg, params)
    sharded_batch = sharding.shard_batch(mesh, batch)
    stepped = jax.jit(make_sharded_train_step(model, cfg, "stage2", rcfg,
                                              mesh))
    s2, m2 = stepped(state0b, sharded_batch)

    # valid-masked metrics are per-shard means pmean'd, not global means
    # over the whole batch — a standard DP semantic difference, so the
    # comparison is loose-relative; drop counters are psum'd exactly
    for k in m1:
        np.testing.assert_allclose(float(m2[k]), float(m1[k]), rtol=5e-3,
                                   atol=1e-5, err_msg=k)
    l1 = jax.tree_util.tree_leaves(s1.params)[0]
    l2 = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), atol=5e-6)
