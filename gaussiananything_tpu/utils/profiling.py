"""Profiling helpers: jax.profiler traces + wall-time scopes.

The reference has only ad-hoc profiling (commented torch.profiler blocks,
`logger.profile_kv` timers — SURVEY.md §5.1). Here tracing is systematic:
`trace(logdir)` captures a TensorBoard-viewable XLA trace of everything in
scope; `annotate` adds named ranges that show up inside the trace.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named range inside a profiler trace (device + host timeline)."""
    return jax.profiler.TraceAnnotation(name)


class Timer:
    """Accumulating wall-time scopes (logger.profile_kv parity)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def scope(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.totals[name] = self.totals.get(name, 0.0) + (
            time.perf_counter() - t0)
        self.counts[name] = self.counts.get(name, 0) + 1

    def means(self) -> Dict[str, float]:
        return {k: self.totals[k] / self.counts[k] for k in self.totals}
