"""Shared timing helpers for the remote-tunnel TPU.

Repeated identical dispatches can be deduplicated by the tunnel and
block_until_ready is unreliable there, so every measurement chains the op
inside one jit'd fori_loop with a data dependency, forces a host read, and
differences two loop lengths to cancel the fixed RPC overhead (same protocol
as bench.py).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def timed_loop(fn, x5, n_small: int = 2, n_big: int = 10) -> float:
    """fn(x5_tuple) -> scalar; returns ms per iteration.

    fn must return a scalar with a data dependency on its inputs; the scalar
    is folded back into the first input to chain iterations.
    """

    @jax.jit
    def run(x5v, n):
        def body(i, x5v):
            out = fn(x5v)
            bump = (1e-30 * out.astype(jnp.float32)).astype(x5v[0].dtype)
            first = x5v[0] + bump
            return (first,) + tuple(x5v[1:])
        return jax.lax.fori_loop(0, n, body, tuple(x5v))[0]

    times = {}
    for n in (n_small, n_big):
        _ = float(run(x5, n).reshape(-1)[0])    # compile + warm
        t0 = time.perf_counter()
        _ = float(run(x5, n).reshape(-1)[0])    # host read = real sync
        times[n] = time.perf_counter() - t0
    return (times[n_big] - times[n_small]) / (n_big - n_small) * 1e3
