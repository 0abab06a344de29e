"""Tracing & step-timing hooks (the reference has none — SURVEY.md §5.1).

Two layers:
* `StepTimer` — cheap wall-clock EMA of step latency + derived throughput,
  logged/TensorBoarded by the Trainer every loss_freq steps.
* `maybe_trace` — capture a jax.profiler trace (TensorBoard 'profile'
  plugin format) for a step window, enabled by config/env.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class StepTimer:
    """EMA step timer with pairs/s throughput."""

    def __init__(self, batch_size: int, alpha: float = 0.1):
        self.batch_size = batch_size
        self.alpha = alpha
        self.ema_s: Optional[float] = None
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is None:
            return
        dt = time.perf_counter() - self._t0
        self.ema_s = (dt if self.ema_s is None
                      else self.alpha * dt + (1 - self.alpha) * self.ema_s)
        self._t0 = None

    @property
    def step_ms(self) -> float:
        return (self.ema_s or 0.0) * 1e3

    @property
    def pairs_per_s(self) -> float:
        return self.batch_size / self.ema_s if self.ema_s else 0.0


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]):
    """jax.profiler trace if trace_dir is set; no-op otherwise."""
    if not trace_dir:
        yield
        return
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region for profiler timelines (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield
