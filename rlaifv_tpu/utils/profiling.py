"""Profiling / tracing hooks — a capability the reference lacks entirely
(SURVEY.md §5: "Tracing / profiling: none"). jax.profiler traces capture
device timelines viewable in TensorBoard/Perfetto; the step timer feeds the
pairs/sec metric the BASELINE requires.
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a device trace while the block runs (no-op if log_dir None)."""
    if not log_dir:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the trace timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Wall-clock EMA of step latency + derived throughput."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self._avg: Optional[float] = None
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._avg = dt if self._avg is None else (
                self.ema * self._avg + (1 - self.ema) * dt
            )
        self._last = now
        return dt

    @property
    def avg_seconds(self) -> Optional[float]:
        return self._avg

    def throughput(self, items_per_step: int) -> Optional[float]:
        if not self._avg:
            return None
        return items_per_step / self._avg
