"""Shape/grad tests for the network stack on tiny synthetic inputs."""

import jax
import jax.numpy as jnp
import numpy as np

from gps_gaussian_tpu.models.encoders import UnetExtractor
from gps_gaussian_tpu.models.gps_gaussian import GPSGaussianModel
from gps_gaussian_tpu.models.raft import RaftStereoHuman
from gps_gaussian_tpu.utils.containers import SourceView, StereoSample


def _fake_view(rng, b, res):
    img = rng.normal(size=(b, res, res, 3)).astype(np.float32)
    mask = np.ones((b, res, res, 1), np.float32)
    intr = np.tile(np.array([[0.8 * res, 0, res / 2],
                             [0, 0.8 * res, res / 2],
                             [0, 0, 1]], np.float32), (b, 1, 1))
    extr = np.tile(np.eye(3, 4, dtype=np.float32), (b, 1, 1))
    extr[:, 2, 3] = 2.0
    return SourceView(
        img=jnp.asarray(img), mask=jnp.asarray(mask),
        intr=jnp.asarray(intr), ref_intr=jnp.asarray(intr + 0),
        extr=jnp.asarray(extr),
        tf_x=jnp.full((b,), -40.0, jnp.float32),
        flow=jnp.zeros((b, res, res, 1)),
        valid=jnp.asarray(mask))


def _sample(rng, b=1, res=64):
    return StereoSample(lmain=_fake_view(rng, b, res),
                        rmain=_fake_view(rng, b, res))


def test_unet_extractor_shapes(rng):
    m = UnetExtractor(encoder_dims=(32, 48, 96))
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    f1, f2, f3 = m.apply(params, x)
    assert f1.shape == (2, 32, 32, 32)
    assert f2.shape == (2, 16, 16, 48)
    assert f3.shape == (2, 8, 8, 96)


def test_raft_head_shapes(rng):
    m = RaftStereoHuman()
    fmap8 = jnp.asarray(rng.normal(size=(2, 8, 8, 96)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), fmap8, iters=2)
    preds = m.apply(params, fmap8, iters=2)
    assert len(preds) == 2
    assert preds[-1].shape == (2, 64, 64, 1)
    # test mode returns only the final prediction
    preds_t = m.apply(params, fmap8, iters=2, test_mode=True)
    assert len(preds_t) == 1
    np.testing.assert_allclose(np.asarray(preds_t[0]),
                               np.asarray(preds[-1]), atol=1e-5)


def test_full_model_stage1_and_stage2(rng):
    sample = _sample(rng, b=1, res=64)

    m1 = GPSGaussianModel(with_gs=False)
    p1 = m1.init(jax.random.PRNGKey(0), sample, iters=2)
    out1 = m1.apply(p1, sample, iters=2)
    assert len(out1.flow_preds) == 2
    assert out1.final_flow.shape == (2, 64, 64, 1)
    assert out1.lmain_gs is None

    m2 = GPSGaussianModel(with_gs=True)
    p2 = m2.init(jax.random.PRNGKey(1), sample, iters=2)
    out2 = m2.apply(p2, sample, iters=2)
    gs = out2.lmain_gs
    assert gs.xyz.shape == (1, 64, 64, 3)
    assert gs.rot.shape == (1, 64, 64, 4)
    assert gs.scale.shape == (1, 64, 64, 3)
    assert gs.opacity.shape == (1, 64, 64, 1)
    # head constraints
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(gs.rot), axis=-1), 1.0, atol=1e-5)
    assert float(gs.scale.max()) <= 0.01 + 1e-6
    assert float(gs.scale.min()) >= 0.0
    assert 0.0 <= float(gs.opacity.min()) <= float(gs.opacity.max()) <= 1.0


def test_model_grads_flow(rng):
    sample = _sample(rng, b=1, res=64)
    m = GPSGaussianModel(with_gs=True)
    params = m.init(jax.random.PRNGKey(0), sample, iters=1)

    def loss_fn(p):
        out = m.apply(p, sample, iters=1)
        return (jnp.abs(out.final_flow).mean()
                + out.lmain_gs.opacity.mean()
                + out.lmain_gs.scale.mean()
                + jnp.abs(out.lmain_gs.xyz).mean())

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    total = sum(float(jnp.abs(g).sum()) for g in leaves)
    assert total > 0


def test_model_bf16_dtype(rng):
    sample = _sample(rng, b=1, res=64)
    m = GPSGaussianModel(with_gs=True, dtype=jnp.bfloat16)
    params = m.init(jax.random.PRNGKey(0), sample, iters=1)
    out = m.apply(params, sample, iters=1)
    # outputs stay f32 regardless of the compute dtype
    assert out.final_flow.dtype == jnp.float32
    assert out.lmain_gs.rot.dtype == jnp.float32
    assert np.isfinite(np.asarray(out.final_flow)).all()
