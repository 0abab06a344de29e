"""TrainState: AdamW + torch-style OneCycle schedule, Orbax checkpointing.

Capability of the reference's optimizer/scheduler/ckpt plumbing
(train_stage1.py:39-41, 140-161): AdamW(lr, wd, eps 1e-8), OneCycleLR with
linear anneal and pct_start 0.01, grad-clip 1.0, latest/final checkpoints,
resume with optimizer state, and the cross-stage PARTIAL restore (stage2
warm-starts raft/encoder params from stage1 while the fresh GSRegresser
keeps its init — the strict=False load at train_stage2.py:50-52).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from gps_gaussian_tpu.train.config import Config


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def onecycle_linear(peak_lr: float, total_steps: int,
                    pct_start: float = 0.01, div_factor: float = 25.0,
                    final_div_factor: float = 1e4) -> optax.Schedule:
    """torch OneCycleLR(anneal_strategy='linear') exactly: linear warmup
    from peak/div over pct_start, then linear decay to
    peak/div/final_div over the rest."""
    up = max(int(total_steps * pct_start), 1)
    init = peak_lr / div_factor
    final = init / final_div_factor
    return optax.join_schedules([
        optax.linear_schedule(init, peak_lr, up),
        optax.linear_schedule(peak_lr, final, total_steps - up),
    ], [up])


def _scale_updates_by_group(scales: dict) -> optax.GradientTransformation:
    """Post-Adam update scaling per TOP-LEVEL param-collection name.

    Scaling the adamw UPDATE is exactly a per-group learning rate (the
    update is lr-linear, weight-decay term included — matching torch
    param-group semantics).  Unmatched groups keep scale 1.0."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params

        def scale(path, u):
            top = _group_of_path(path)
            return u * scales.get(top, 1.0)

        return jax.tree_util.tree_map_with_path(scale, updates), state

    return optax.GradientTransformation(init, update)


def _group_of_path(path):
    """Module-group name of a param path: the key under the flax 'params'
    wrapper when present, else the first key.  Non-dict path entries
    (tuple/list nodes) yield None -> scale 1.0, never an error."""
    keys = [getattr(e, "key", None) for e in path[:2]]
    if keys and keys[0] == "params" and len(keys) > 1:
        return keys[1]
    return keys[0] if keys else None


def validate_group_scales(scales: dict, params) -> None:
    """Every lr_group_scales key must name a module group that exists in
    the params tree — a typo'd key would otherwise be a silent no-op
    (exactly how a training fix fails to apply)."""
    groups = set()
    for kp, _ in jax.tree_util.tree_flatten_with_path(params)[0]:
        groups.add(_group_of_path(kp))
    missing = sorted(set(scales) - groups)
    if missing:
        raise ValueError(
            f"lr_group_scales keys {missing} match no top-level module in "
            f"the param tree (groups present: {sorted(g for g in groups if g)})")


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    if cfg.scheduler == "constant":
        sched = cfg.lr
    elif cfg.scheduler == "onecycle":
        sched = onecycle_linear(
            cfg.lr, cfg.scheduler_steps or (cfg.num_steps + 100))
    else:
        raise ValueError(f"unknown scheduler {cfg.scheduler!r} "
                         "(expected 'onecycle' or 'constant')")
    chain = [
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(learning_rate=sched, weight_decay=cfg.wdecay,
                    eps=1e-8),
    ]
    if cfg.lr_group_scales:
        chain.append(_scale_updates_by_group(dict(cfg.lr_group_scales)))
    return optax.chain(*chain)


def create_state(cfg: Config, params) -> TrainState:
    if cfg.lr_group_scales:
        validate_group_scales(dict(cfg.lr_group_scales), params)
    tx = make_optimizer(cfg)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), tx=tx)


# ------------------------------------------------------------------ orbax

_MANAGERS: dict = {}


def _manager(ckpt_dir: str):
    """One CheckpointManager per directory: orbax async saves coordinate
    through per-manager background threads, so churning fresh managers for
    every save deadlocks the signaling barrier.

    Step dirs named either `<step>` (orbax default; what save_checkpoint
    writes) or `ckpt_<step>` (the archival naming used for committed run
    artifacts, e.g. runs/synth256/stage1/ckpt_2500) are both recognised —
    the prefix is auto-detected from the directory contents."""
    import re

    import orbax.checkpoint as ocp

    key = str(Path(ckpt_dir).absolute())
    if key not in _MANAGERS:
        prefix = None
        p = Path(key)
        if p.is_dir() and not any(re.fullmatch(r"\d+", c.name)
                                  for c in p.iterdir() if c.is_dir()):
            if any(re.fullmatch(r"ckpt_\d+", c.name)
                   for c in p.iterdir() if c.is_dir()):
                prefix = "ckpt"
        _MANAGERS[key] = ocp.CheckpointManager(
            key, options=ocp.CheckpointManagerOptions(max_to_keep=3,
                                                      create=True,
                                                      step_prefix=prefix))
    return _MANAGERS[key]


def save_checkpoint(ckpt_dir: str, state: TrainState, wait: bool = False):
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    mgr.save(int(state.step), args=ocp.args.StandardSave(
        {"step": state.step, "params": state.params,
         "opt_state": state.opt_state}))
    if wait:
        mgr.wait_until_finished()
    return mgr


def restore_checkpoint(ckpt_dir: str, state: TrainState,
                       step: Optional[int] = None) -> TrainState:
    """Full resume: params + optimizer + step (train_stage1.py:140-151)."""
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    target = {"step": state.step, "params": state.params,
              "opt_state": state.opt_state}
    restored = mgr.restore(step, args=ocp.args.StandardRestore(target))
    return state.replace(step=restored["step"], params=restored["params"],
                         opt_state=restored["opt_state"])


def restore_params_partial(ckpt_dir: str, params,
                           step: Optional[int] = None):
    """Cross-stage warm start: copy every leaf whose path exists in the
    checkpoint, keep fresh init for the rest (strict=False semantics,
    train_stage2.py:50-52).  No optimizer state is restored."""
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    try:
        ckpt = mgr.restore(step)
    except ValueError:
        # a targetless restore replays the SAVED device shardings, which
        # fails when the checkpoint was written on different hardware
        # (e.g. committed TPU-trained ckpts restored on CPU).  Rebuild an
        # abstract target on the local default device from the saved
        # structure and restore into that instead.
        meta = mgr.item_metadata(step)
        dev = jax.local_devices()[0]
        sharding = jax.sharding.SingleDeviceSharding(dev)

        def abstract(leaf):
            return jax.ShapeDtypeStruct(tuple(leaf.shape), leaf.dtype,
                                        sharding=sharding)

        target = jax.tree_util.tree_map(abstract, dict(meta))
        ckpt = mgr.restore(step, args=ocp.args.StandardRestore(target))
    saved = ckpt["params"]

    flat_new = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_saved = {jax.tree_util.keystr(kp): v for kp, v in
                  jax.tree_util.tree_flatten_with_path(saved)[0]}

    merged, n_loaded = [], 0
    for kp, leaf in flat_new:
        key = jax.tree_util.keystr(kp)
        if key in flat_saved and flat_saved[key].shape == leaf.shape:
            merged.append(jnp.asarray(flat_saved[key]))
            n_loaded += 1
        else:
            merged.append(leaf)
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, merged), n_loaded
