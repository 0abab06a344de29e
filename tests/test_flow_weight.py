"""Stage-2 loss-mix knobs: flow_weight 0 must EXCLUDE the flow branch
from the gradient program (the compiled-program sensitivity bisected in
ROADMAP.md — a dead 0*flow term or metric-only sequence_loss measurably
changes the shared backbone gradients' compiled program on TPU), and a
nonzero flow_weight must reproduce the reference mix exactly.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gps_gaussian_tpu.testing import fake_stereo_batch
from gps_gaussian_tpu.train import state as state_lib
from gps_gaussian_tpu.train import trainer as T
from gps_gaussian_tpu.train.config import Config, RasterConfig

pytestmark = pytest.mark.fast

RES = 64


def _setup(flow_weight):
    cfg = Config(stage="stage2", flow_weight=flow_weight, batch_size=1,
                 raster=RasterConfig(max_tiles_per_gaussian=8,
                                     max_per_tile=256, fg_cap=2048,
                                     pair_budget=16384, backend="jnp"))
    batch = fake_stereo_batch(batch=1, res=RES)
    model = T.make_model(cfg, with_gs=True)
    rcfg = T.make_raster_config(cfg)
    params = jax.jit(lambda k, b: model.init(k, b, iters=2))(
        jax.random.PRNGKey(0), batch)
    state = state_lib.create_state(cfg, params)
    step = jax.jit(T.make_train_step(model, cfg, "stage2", rcfg))
    return step, state, batch


def test_flow_weight_zero_excludes_flow_from_loss_and_metrics():
    step, state, batch = _setup(0.0)
    new_state, m = step(state, batch)
    # no flow metrics in the train program at flow_weight 0 (they would
    # keep the flow branches live in the gradient program)
    assert "flow_loss" not in m and "train_epe" not in m
    # loss is exactly the photometric mix
    expect = 0.8 * float(m["l1"]) + 0.2 * (1.0 - float(m["ssim"]))
    np.testing.assert_allclose(float(m["loss"]), expect, rtol=1e-5)
    # drop counters still reported (never silent)
    assert "num_pair_dropped" in m
    # and the step actually trained something
    moved = any(
        not jnp.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(new_state.params)))
    assert moved


def test_flow_weight_reference_mix_exact():
    step, state, batch = _setup(1.0)
    _, m = step(state, batch)
    assert "flow_loss" in m and "train_epe" in m
    expect = (1.0 * float(m["flow_loss"]) + 0.8 * float(m["l1"])
              + 0.2 * (1.0 - float(m["ssim"])))
    np.testing.assert_allclose(float(m["loss"]), expect, rtol=1e-5)
