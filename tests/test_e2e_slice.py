"""BASELINE config 1: the minimum end-to-end slice at 256x256 on CPU —
stereo pair -> network -> Gaussians -> rasterize -> loss -> full backward
(SURVEY.md §7 'minimum end-to-end slice'), plus determinism invariants."""

import numpy as np
import jax
import jax.numpy as jnp

from gps_gaussian_tpu.kernels.rasterizer import (RasterizeConfig,
                                                 rasterize_single)
from gps_gaussian_tpu.testing import fake_stereo_batch
from gps_gaussian_tpu.train.config import load_config
from gps_gaussian_tpu.train.losses import l1_loss
from gps_gaussian_tpu.train.trainer import (make_model, make_raster_config,
                                            render_novel)

import pytest

pytestmark = pytest.mark.fast


def test_e2e_256_fwd_bwd():
    cfg = load_config(
        None,
        # caps sized for the random-init scene (untrained nets emit some
        # near-camera points with large splats); the zero-drop asserts below
        # prove the counters verify cap adequacy end-to-end
        raster=dict(max_tiles_per_gaussian=256, max_per_tile=2048,
                    backend="jnp"))
    batch = fake_stereo_batch(batch=1, res=256, novel_res=256, seed=2)
    model = make_model(cfg, with_gs=True)
    params = model.init(jax.random.PRNGKey(0), batch, iters=1)
    rcfg = make_raster_config(cfg)

    def loss_fn(params):
        out = model.apply(params, batch, iters=1)
        img, aux = render_novel(out, batch.novel, jnp.zeros(3), rcfg)
        return l1_loss(img, batch.novel.img), aux

    (loss, aux), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(params)
    assert np.isfinite(float(loss))
    # default caps must not truncate the slice scene: counted, never silent
    assert int(aux.num_dropped.sum()) == 0
    assert int(aux.num_fg_dropped.sum()) == 0
    assert int(aux.num_pair_dropped.sum()) == 0
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # gradient reaches every parameter group (encoder, raft, gsnet)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    groups = {"img_encoder": 0.0, "raft_stereo": 0.0, "gs_regresser": 0.0}
    for kp, g in flat:
        key = jax.tree_util.keystr(kp)
        for gname in groups:
            if gname in key:
                groups[gname] += float(jnp.abs(g).sum())
    assert all(v > 0 for v in groups.values()), groups


def test_rasterizer_is_deterministic(rng):
    """No atomics anywhere: two identical renders must agree bitwise
    (SURVEY.md §5.2 — the reference's z-buffers race benignly; ours don't
    race at all)."""
    from gps_gaussian_tpu.geometry import cameras

    res, n = 64, 500
    K = np.array([[0.8 * res, 0, res / 2], [0, 0.8 * res, res / 2],
                  [0, 0, 1]], np.float32)
    E = np.eye(3, 4, dtype=np.float32)
    E[2, 3] = 2.0
    cam = cameras.camera_from_intr_extr(K, E, res, res)
    xyz = rng.normal(scale=0.3, size=(n, 3)).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    args = (jnp.asarray(xyz), jnp.asarray(q),
            jnp.full((n, 3), 0.02), jnp.full((n, 1), 0.7),
            jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
            jnp.ones((n,)), jnp.asarray(cam["view"]),
            jnp.asarray(cam["proj"]))
    cfg = RasterizeConfig(max_tiles_per_gaussian=16, max_per_tile=256,
                          backend="jnp")

    def render(*a):
        return rasterize_single(*a, cam["tanfovx"], cam["tanfovy"],
                                res, res, jnp.zeros(3), cfg)[0]

    f = jax.jit(render)
    a = np.asarray(f(*args))
    b = np.asarray(f(*args))
    np.testing.assert_array_equal(a, b)

    def g(*a):
        return jax.grad(
            lambda xyz: jnp.sum(render(xyz, *a[1:]) ** 2))(a[0])

    ga = np.asarray(jax.jit(g)(*args))
    gb = np.asarray(jax.jit(g)(*args))
    np.testing.assert_array_equal(ga, gb)
