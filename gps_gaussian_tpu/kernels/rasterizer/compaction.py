"""Shared live-first compaction ordering.

Four call sites compact fixed-size Gaussian sets to a static cap (the
TPU replacement for the reference's variable-length boolean-mask gathers,
lib/GaussianRender.py:16-27): the rasterizer's fg_cap, the batched
stack-compact, the tile-sharded band compact, and freeview's
once-per-frame compact.  They share this ordering helper so the subtle
invariants live in ONE place:

* the argsort is stable, so kept rows preserve their relative order;
* indices returned for gathering are UNIQUE (a slice of a permutation) —
  required by take_rows_unique's inverse-permutation backward;
* when cap >= n nothing can be dropped and NO gather order is returned:
  padding an order would duplicate index 0 and silently break that
  uniqueness (a real bug once); callers mask/pad in place instead.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def live_first_order(keep: jnp.ndarray, cap: int) -> Tuple[
        Optional[jnp.ndarray], jnp.ndarray, jnp.ndarray]:
    """Stable keep-rows-first ordering truncated to `cap` slots.

    Args:
      keep: (N,) bool mask of rows to keep.
      cap: static output slot count.
    Returns (idx, live, n_dropped):
      idx: (cap,) i32 UNIQUE row indices to gather, or None when
        cap >= N (gather unnecessary — mask in place, pad if cap > N).
      live: (cap,) f32 {0,1} validity of each output slot (when idx is
        None and cap > N, padded with zeros).
      n_dropped: () i32 kept rows lost to the cap.
    """
    n = keep.shape[0]
    n_live = jnp.sum(keep.astype(jnp.int32))
    if cap < n:
        order = jnp.argsort(jnp.logical_not(keep))
        n_kept = jnp.minimum(n_live, cap)
        live = (jnp.arange(cap, dtype=jnp.int32)
                < n_kept).astype(jnp.float32)
        return order[:cap], live, n_live - n_kept
    live = keep.astype(jnp.float32)
    if cap > n:
        live = jnp.pad(live, (0, cap - n))
    return None, live, jnp.zeros((), jnp.int32)
