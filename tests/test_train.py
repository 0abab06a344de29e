"""End-to-end training smoke + behavior tests on the virtual CPU mesh."""

import logging

import numpy as np
import jax
import pytest

from gps_gaussian_tpu.data import synth
from gps_gaussian_tpu.train import sharding, state as state_lib
from gps_gaussian_tpu.train.config import Config, load_config
from gps_gaussian_tpu.train.trainer import Trainer

logging.basicConfig(level=logging.INFO)

RES = 64


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("traindata")
    synth.generate_dataset(root, n_train=2, n_val=1, res=RES, hr=False)
    return root


def _cfg(data_root, tmp_path, stage, **kw) -> Config:
    base = dict(
        name=f"test_{stage}", stage=stage, batch_size=2, num_steps=4,
        dataset=dict(data_root=str(data_root), src_res=RES,
                     use_hr_img=False, use_processed_data=True),
        raster=dict(max_tiles_per_gaussian=8, max_per_tile=256,
                    backend="jnp"),
        record=dict(ckpt_path=str(tmp_path), loss_freq=2, eval_freq=100))
    base.update(kw)
    return load_config(None, **base)


def test_onecycle_schedule_matches_torch_shape():
    sched = state_lib.onecycle_linear(2e-4, 1000, pct_start=0.01)
    lrs = [float(sched(i)) for i in (0, 10, 500, 999)]
    assert lrs[0] == pytest.approx(2e-4 / 25, rel=1e-3)
    assert lrs[1] == pytest.approx(2e-4, rel=1e-3)       # peak at 1%
    assert lrs[2] < 2e-4 and lrs[3] < lrs[2]             # linear decay


def test_stage1_training_runs_and_learns(data_root, tmp_path):
    cfg = _cfg(data_root, tmp_path, "stage1", num_steps=6)
    mesh = sharding.make_mesh(2)
    tr = Trainer(cfg, exp_dir=str(tmp_path / "exp1"), mesh=mesh)
    try:
        batch = tr._device_batch(next(tr.train_loader))
        _, m0 = tr.train_step(tr.state, batch)
        # re-init (train_step donated the state) and train
        tr.state = state_lib.create_state(cfg, tr.model.init(
            jax.random.PRNGKey(0), batch, iters=cfg.raft.train_iters))
        state = tr.train()
        assert int(state.step) == 6
        metrics = tr.run_eval(6, max_batches=2)
        assert np.isfinite(metrics["val_epe"])
        # checkpoints written
        assert (tmp_path / "exp1" / "ckpt").exists()
    finally:
        tr.close()


def test_stage2_training_and_partial_restore(data_root, tmp_path):
    mesh = sharding.make_mesh(2)
    cfg1 = _cfg(data_root, tmp_path, "stage1", num_steps=2)
    tr1 = Trainer(cfg1, exp_dir=str(tmp_path / "s1"), mesh=mesh)
    try:
        tr1.train()
    finally:
        tr1.close()

    cfg2 = _cfg(data_root, tmp_path, "stage2", num_steps=2,
                stage1_ckpt=str(tmp_path / "s1" / "ckpt"))
    tr2 = Trainer(cfg2, exp_dir=str(tmp_path / "s2"), mesh=mesh)
    try:
        state = tr2.train()
        assert int(state.step) == 2
        metrics = tr2.run_eval(2, max_batches=1)
        assert np.isfinite(metrics["val_psnr"])
        assert metrics["val_psnr"] > 5.0   # renders something image-like
    finally:
        tr2.close()


def test_stage2_loss_decreases_with_training(data_root, tmp_path):
    """Overfit a single batch for a few steps: loss must go down."""
    cfg = _cfg(data_root, tmp_path, "stage2", num_steps=2, lr=1e-3,
               scheduler_steps=10000)
    mesh = sharding.make_mesh(2)
    tr = Trainer(cfg, exp_dir=str(tmp_path / "overfit"), mesh=mesh)
    try:
        batch = tr._device_batch(next(tr.train_loader))
        losses_seen = []
        state = tr.state
        for _ in range(8):
            state, m = tr.train_step(state, batch)
            losses_seen.append(float(m["loss"]))
        assert np.isfinite(losses_seen).all()
        assert min(losses_seen[-3:]) < losses_seen[0]
    finally:
        tr.close()


def test_stage2_hr_novel_target(data_root, tmp_path):
    """The production stage-2 regime trains against a 2x hi-res novel
    target (reference config/stage2.yaml use_hr_img +
    lib/human_loader.py:409): the train step must consume a novel view at
    2x the source resolution, render it, and report drop counters."""
    from gps_gaussian_tpu.testing import fake_stereo_batch
    from gps_gaussian_tpu.train.config import load_config
    from gps_gaussian_tpu.train.trainer import (make_model,
                                                make_raster_config,
                                                make_train_step)
    from gps_gaussian_tpu.train import state as state_lib

    res = RES  # source; novel target is 2x
    cfg = load_config(
        None, batch_size=2,
        raster=dict(max_tiles_per_gaussian=16, max_per_tile=256,
                    backend="jnp",
                    pair_budget=3 * (2 * res) * (2 * res) // 2),
        dataset=dict(src_res=res, use_hr_img=True))
    batch = fake_stereo_batch(batch=2, res=res, novel_res=2 * res)
    assert batch.novel.img.shape == (2, 2 * res, 2 * res, 3)

    model = make_model(cfg, with_gs=True)
    params = model.init(jax.random.PRNGKey(0), batch,
                        iters=cfg.raft.train_iters)
    state = state_lib.create_state(cfg, params)
    step = jax.jit(make_train_step(model, cfg, "stage2",
                                   make_raster_config(cfg)))
    state, metrics = step(state, batch)
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    for k in ("num_dropped", "num_fg_dropped", "num_pair_dropped"):
        assert k in metrics and np.isfinite(float(metrics[k]))


def test_batch_mesh_divisibility_guard(data_root, tmp_path):
    """A batch that doesn't divide the ('data',) mesh fails at Trainer
    construction with a config-time message, not a raw shard_map error."""
    cfg = _cfg(data_root, tmp_path, "stage1", batch_size=3)
    with pytest.raises(ValueError, match="divisible by the 2-device"):
        Trainer(cfg, exp_dir=str(tmp_path / "exp_guard"),
                mesh=sharding.make_mesh(2))
