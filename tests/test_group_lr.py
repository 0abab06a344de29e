"""Per-group lr scaling (Config.lr_group_scales) — the stage-2 warm-start
fix must provably apply: scaled groups' adamw updates differ by EXACTLY
the scale (update is lr-linear, weight-decay term included, matching
torch param-group semantics), unmatched groups are bit-identical, the
resolution works with and without the flax 'params' wrapper, and a
typo'd group name raises instead of silently no-opping.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gps_gaussian_tpu.train import state as state_lib
from gps_gaussian_tpu.train.config import Config

pytestmark = pytest.mark.fast


def _params(wrapped: bool):
    tree = {
        "img_encoder": {"conv": {"kernel": jnp.ones((3, 4)) * 0.5,
                                 "bias": jnp.ones((4,))}},
        "gs_regresser": {"head": {"kernel": jnp.full((4, 2), -0.3)}},
    }
    return {"params": tree} if wrapped else tree


def _grads(params):
    return jax.tree.map(lambda p: jnp.ones_like(p) * 0.01, params)


@pytest.mark.parametrize("wrapped", [True, False])
def test_scaled_group_update_is_exactly_scale_times_base(wrapped):
    scale = 0.125
    base_cfg = Config(lr=1e-3, wdecay=1e-2, num_steps=100)
    scaled_cfg = dataclasses.replace(
        base_cfg, lr_group_scales={"img_encoder": scale})

    p = _params(wrapped)
    g = _grads(p)
    s_base = state_lib.create_state(base_cfg, p)
    s_scaled = state_lib.create_state(scaled_cfg, p)

    u_base, _ = s_base.tx.update(g, s_base.opt_state, p)
    u_scaled, _ = s_scaled.tx.update(g, s_scaled.opt_state, p)

    root_b = u_base["params"] if wrapped else u_base
    root_s = u_scaled["params"] if wrapped else u_scaled
    for leaf_b, leaf_s in zip(jax.tree.leaves(root_b["img_encoder"]),
                              jax.tree.leaves(root_s["img_encoder"])):
        np.testing.assert_allclose(np.asarray(leaf_s),
                                   np.asarray(leaf_b) * scale,
                                   rtol=1e-6)
        assert float(jnp.abs(leaf_b).max()) > 0  # non-trivial update
    # unmatched group: bit-identical
    for leaf_b, leaf_s in zip(jax.tree.leaves(root_b["gs_regresser"]),
                              jax.tree.leaves(root_s["gs_regresser"])):
        assert jnp.array_equal(leaf_b, leaf_s)


def test_typo_group_name_raises():
    cfg = Config(lr_group_scales={"img_encodr": 0.1})
    with pytest.raises(ValueError, match="img_encodr"):
        state_lib.create_state(cfg, _params(True))


def test_multi_step_divergence_only_in_scaled_group():
    """After several apply_gradients steps the scaled group's params
    diverge from the single-lr baseline (the fix has a real effect over
    a trajectory, not just one update)."""
    base_cfg = Config(lr=1e-3, wdecay=1e-2, num_steps=100)
    scaled_cfg = dataclasses.replace(
        base_cfg, lr_group_scales={"img_encoder": 0.1})
    p = _params(True)
    s_b = state_lib.create_state(base_cfg, p)
    s_s = state_lib.create_state(scaled_cfg, p)
    for i in range(3):
        g = jax.tree.map(
            lambda x: jnp.cos(x + float(i)) * 0.01, s_b.params)
        s_b = s_b.apply_gradients(g)
        g2 = jax.tree.map(
            lambda x: jnp.cos(x + float(i)) * 0.01, s_s.params)
        s_s = s_s.apply_gradients(g2)
    enc_b = jax.tree.leaves(s_b.params["params"]["img_encoder"])
    enc_s = jax.tree.leaves(s_s.params["params"]["img_encoder"])
    assert any(not jnp.array_equal(a, b) for a, b in zip(enc_b, enc_s))
