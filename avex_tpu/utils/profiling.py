"""Profiling / tracing helpers (first-class, unlike the reference).

The reference has no profiler integration — only wall-clock timers
(SURVEY §5). Here ``jax.profiler`` trace capture and per-step timing are
one-liners usable from the Trainer or ad-hoc scripts:

    with trace("/tmp/profile"):
        trainer.train()

    timer = StepTimer()
    ...
    with timer.step():
        train_step(...)
    print(timer.summary())
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List

import jax

__all__ = ["trace", "StepTimer", "annotate"]


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a TensorBoard-viewable ``jax.profiler`` trace."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing with warmup-aware summaries."""

    def __init__(self, skip_first: int = 1) -> None:
        self.skip_first = skip_first
        self.durations: List[float] = []

    @contextlib.contextmanager
    def step(self) -> Iterator[None]:
        """Context manager timing one step."""
        start = time.perf_counter()
        yield
        self.durations.append(time.perf_counter() - start)

    def summary(self) -> Dict[str, float]:
        """Aggregate durations (excluding warmup steps)."""
        timed = self.durations[self.skip_first :] or self.durations
        if not timed:
            return {"steps": 0}
        return {
            "steps": len(self.durations),
            "mean_s": sum(timed) / len(timed),
            "min_s": min(timed),
            "max_s": max(timed),
            "total_s": sum(self.durations),
        }
