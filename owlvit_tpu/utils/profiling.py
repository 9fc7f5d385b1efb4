"""Profiling/tracing: jax.profiler integration + per-step timing.

The reference's only instrumentation is tqdm progress bars and a wall-clock
column (SURVEY §5.1). Here:

  * `trace(logdir)` — context manager around any region; produces a
    TensorBoard-loadable / Perfetto-loadable XPlane trace via jax.profiler.
  * `StepTimer` — cheap per-step wall-time tracker with percentile summary
    (blocks on the device result it is handed, so timings are real).
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace for the enclosed region."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self.durations: list = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        """Block on `result` (device array/pytree) then record elapsed."""
        if result is not None:
            jax.block_until_ready(result)
        self.durations.append(time.perf_counter() - self._t0)

    def summary(self) -> dict:
        if not self.durations:
            return {}
        d = np.asarray(self.durations)
        return {
            "steps": len(d),
            "mean_s": float(d.mean()),
            "p50_s": float(np.percentile(d, 50)),
            "p90_s": float(np.percentile(d, 90)),
            "total_s": float(d.sum()),
        }
