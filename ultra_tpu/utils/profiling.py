"""Profiling and step-timing utilities — a first-class subsystem the
reference lacks entirely (SURVEY.md §5: only wall-clock timeit around query
eval, run_query.py:249-255).

- ``trace(logdir)``: jax.profiler trace context (XLA + Pallas kernel
  timelines, viewable in TensorBoard / xprof).
- ``annotate(name)``: named TraceAnnotation for host-side phases.
- ``StepTimer``: rolling step-time / throughput tracker with device sync.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str, with_metadata: bool = True):
    """Capture a profiler trace of the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the host timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling wall-clock step stats with optional edges/s accounting.

    Under async dispatch the caller must hand in a per-step output to block
    on (sync=...) — otherwise times reflect dispatch, not execution.
    """

    def __init__(self, window: int = 50, edges_per_step: Optional[int] = None):
        self.times = deque(maxlen=window)
        self.edges_per_step = edges_per_step
        self._last = None

    def start(self):
        self._last = time.perf_counter()

    def stop(self, sync=None) -> float:
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - self._last
        self.times.append(dt)
        return dt

    @property
    def mean_step_s(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    @property
    def edges_per_sec(self) -> Optional[float]:
        if self.edges_per_step is None or not self.times:
            return None
        return self.edges_per_step / self.mean_step_s

    def summary(self) -> str:
        s = f"step {self.mean_step_s * 1e3:.1f} ms"
        eps = self.edges_per_sec
        if eps is not None:
            s += f", {eps / 1e6:.1f} M edges/s"
        return s
