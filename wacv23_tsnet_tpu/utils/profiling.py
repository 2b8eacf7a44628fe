"""Profiling helpers (SURVEY.md §5: the reference has only wall-clock
AverageMeters; the TPU equivalent is jax.profiler traces + step timing)."""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tsnet_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a trace (jax.profiler.TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StepProfiler:
    """Rolling per-step wall-clock stats with percentiles."""

    def __init__(self, window: int = 200):
        self.window = window
        self.samples: list[float] = []
        self._t = None

    def start(self):
        self._t = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t
        self.samples.append(dt)
        if len(self.samples) > self.window:
            self.samples.pop(0)
        return dt

    def summary(self) -> dict:
        if not self.samples:
            return {}
        s = sorted(self.samples)
        n = len(s)
        return {
            "mean_s": sum(s) / n,
            "p50_s": s[n // 2],
            "p90_s": s[int(n * 0.9)],
            "max_s": s[-1],
            "steps_per_sec": n / sum(s),
        }
