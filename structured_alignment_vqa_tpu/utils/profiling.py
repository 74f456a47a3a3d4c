"""Profiling hooks — absent from the reference (SURVEY.md section 5.1: its only
instrument was a commented nvidia-smi probe and globally-enabled anomaly
detection). Here: JAX profiler traces + a lightweight step timer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a JAX profiler trace viewable in XProf/TensorBoard."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Steps/sec over a sliding window; call ``tick()`` once per step."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        self._times.append(now)
        if len(self._times) > self.window:
            self._times.pop(0)
        if len(self._times) < 2:
            return None
        return (len(self._times) - 1) / (self._times[-1] - self._times[0])
