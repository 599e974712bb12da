"""Profiling & step-timing hooks.

The reference has no profiler integration at all (SURVEY.md §5 "Tracing /
profiling: absent"); the TPU-native equivalent is ``jax.profiler``:

* ``trace(log_dir)`` — capture an XLA/TPU trace viewable in TensorBoard's
  profile plugin or Perfetto,
* ``annotate(name)`` — label a region so train-step phases show up in traces,
* ``StepTimer`` — cheap wall-clock step timing with warmup discard, the
  number the bench harness reports.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (shows in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling train-step timing: call ``tick()`` once per step."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self._count = 0
        self._t_last: float | None = None
        self._total = 0.0
        self._timed_steps = 0

    def tick(self) -> None:
        now = time.perf_counter()
        if self._t_last is not None:
            self._count += 1
            if self._count > self.warmup:
                self._total += now - self._t_last
                self._timed_steps += 1
        self._t_last = now

    @property
    def mean_step_seconds(self) -> float:
        return self._total / self._timed_steps if self._timed_steps else 0.0

    def throughput(self, items_per_step: int) -> float:
        s = self.mean_step_seconds
        return items_per_step / s if s else 0.0
