"""Profiling hooks (first-class replacement for the reference's vestigial
torch profiler mode, train.py:344-372, and its per-iteration wall timing).

Usage:
    with trace_steps("/tmp/trace", enabled=step < 5):
        state, metrics = train_step(state, batch)

or the step timer:
    timer = StepTimer()
    with timer:
        ...
    print(timer.summary())
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace_steps(logdir: str, enabled: bool = True):
    """JAX profiler trace (xplane + perfetto) around a block."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing with running stats."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    def summary(self, skip_warmup: int = 1) -> dict:
        ts = self.times[skip_warmup:] or self.times
        if not ts:
            return {}
        return {
            "steps": len(ts),
            "mean_s": sum(ts) / len(ts),
            "min_s": min(ts),
            "max_s": max(ts),
        }
