"""Tracing/profiling hooks.

The reference has NO profiling (SURVEY §5: tracing ABSENT); this adds the
TPU-native story: jax.profiler traces (viewable in TensorBoard/XProf or
Perfetto) around training steps or arbitrary blocks, plus simple step
timers written to the metric loggers.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace for the enclosed block.

    View with: tensorboard --logdir <log_dir>  (profile plugin) or load
    the .trace.json.gz in Perfetto.
    """
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step timing: call tick() per step; stats() gives
    steps/sec and examples/sec."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    def stats(self, batch_size: int = 1) -> Dict[str, float]:
        if not self._times:
            return {"steps_per_sec": 0.0, "examples_per_sec": 0.0}
        mean = sum(self._times) / len(self._times)
        return {
            "steps_per_sec": 1.0 / mean,
            "examples_per_sec": batch_size / mean,
        }


def annotate(name: str):
    """Named region for the profiler timeline (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)
