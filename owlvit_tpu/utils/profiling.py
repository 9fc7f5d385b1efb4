"""Per-step timing utilities.

The reference's only instrumentation is tqdm progress bars and a wall-clock
column (SURVEY §5.1). Device TRACING does not live here: on the TPU relay,
`jax.profiler.start/stop_trace` poisons the chip unless tracing is the
process's ONLY job (CLAUDE.md r2) — capture traces with
`tools/bench_profile.py` (a dedicated trace-only process) and read them with
`tools/trace_top_ops.py`; the trainer's `training.profile_dir` knob wraps
the same calls for the profiling-is-the-job case. A general-purpose trace()
context manager used to live here; it had no callers and packaged exactly
the in-process pattern the relay forbids, so it was removed (r5).
"""

from __future__ import annotations

import time

import jax
import numpy as np


class StepTimer:
    """Cheap per-step wall-time tracker with percentile summary (blocks on
    the device result it is handed, so timings are real)."""

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
