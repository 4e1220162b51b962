"""Profiling helpers: per-phase wall-clock timing and jax.profiler traces.

The reference's only observability is a per-step wall-clock print
(reference nerf/train.py:49-56); this adds structured phase timing and an
optional XLA trace dump (SURVEY.md §5 tracing plan).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


class StepTimer:
    """Accumulates wall-clock per named phase; cheap enough for every step."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - start
            self.counts[name] += 1

    def mean(self, name: str) -> float:
        count = self.counts.get(name, 0)
        return self.totals[name] / count if count else 0.0

    def summary(self) -> Dict[str, float]:
        return {name: self.mean(name) for name in self.totals}

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace_context(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace when a directory is given; no-op otherwise."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
