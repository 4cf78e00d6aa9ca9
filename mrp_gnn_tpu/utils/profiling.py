"""Profiling helpers: JAX profiler traces with named-scope attribution.

SURVEY.md section 5 ("Tracing / profiling"): kernels are wrapped in
jax.named_scope (encoder / graph_fusion_* / decoder — see models/), so a
profiler trace attributes device time per stage. View traces with
TensorBoard (`tensorboard --logdir <dir>`) or Perfetto.
"""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def trace(logdir: str):
    """Context manager capturing a device trace into logdir."""
    import jax
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Cheap wall-clock per-step timer producing JSONL-ready records."""

    def __init__(self):
        self._t0 = None
        self.records = []

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, **extra) -> dict:
        dt = time.perf_counter() - self._t0
        rec = {"step_time_s": dt, **extra}
        self.records.append(rec)
        return rec
