"""Tracing / profiling utilities.

The reference has no profiler integration — only manual perf_counter timing
of data and step time (train.py:516-518,615-620) and a disabled DeepSpeed
wall_clock_breakdown. Here:

  * `trace(path)` — context manager around jax.profiler for device traces
    viewable in TensorBoard/XProf;
  * `annotate(name)` — TraceAnnotation for named regions inside jitted code;
  * `StepTimer` — host-side data/step-time split matching the reference's
    log line format.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in device traces (use around jitted calls)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """data_time / step_time tracker (reference train.py:516-518,615-620)."""

    def __init__(self):
        self._t = time.perf_counter()
        self.data_time = 0.0
        self.step_time = 0.0

    def data_done(self):
        now = time.perf_counter()
        self.data_time = now - self._t
        self._t = now

    def step_done(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        self.step_time = now - self._t
        self._t = now

    def metrics(self) -> Dict[str, float]:
        return {"data_time": self.data_time, "step_time": self.step_time}
