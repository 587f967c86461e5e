"""Tracing / profiling helpers.

The reference's observability is line_profiler runs + per-iteration data
dicts (SURVEY.md §5.1). Here: (a) the samplers already return structured
``RunData``; (b) this module adds a JAX-native device tracer (perfetto/
tensorboard trace of the compiled program) and a wall-clock section timer.
"""
from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def device_trace(out_dir: str | Path) -> Iterator[None]:
    """Capture an XLA device trace viewable in TensorBoard/Perfetto:

    >>> with device_trace("/tmp/trace"):
    ...     jax.block_until_ready(solve(...))
    """
    out_dir = str(out_dir)
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SectionTimer:
    """Accumulating wall-clock timer with device synchronization.

    >>> timer = SectionTimer()
    >>> with timer.section("rollout"):
    ...     out = rollout(...)
    >>> timer.summary()
    """

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str, sync: Optional[object] = None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": round(total, 4),
                "calls": self.counts[name],
                "mean_ms": round(1e3 * total / self.counts[name], 3),
            }
            for name, total in sorted(
                self.totals.items(), key=lambda kv: -kv[1]
            )
        }
