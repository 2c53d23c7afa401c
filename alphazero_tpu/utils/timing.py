"""Per-phase step timers + optional profiler traces.

The reference has no tracing/profiling at all (SURVEY.md §5). Each coach
phase (self-play / replay / train / arena) is timed with device-sync
boundaries, and a ``jax.profiler`` trace can be captured around any phase
for offline analysis.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Accumulates wall-clock per named phase (device-synced)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def time_phase(self, name: str, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        out = jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        return out

    def summary(self) -> Dict[str, float]:
        return dict(self.totals)

    def reset(self) -> Dict[str, float]:
        s = self.summary()
        self.totals.clear()
        self.counts.clear()
        return s


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace around a block (no-op if log_dir None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
