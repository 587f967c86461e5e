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


def scan_time(fn, x, reps: int = 8) -> float:
    """Trustworthy per-application wall time of ``fn`` on remote-dispatched
    accelerators — seconds per application.

    Three traps this layout avoids (each silently corrupts naive timings on
    the remote-tunnel TPU runtime this framework was benchmarked on):

    1. Host-side rep loops — even data-chained ones — measure per-dispatch
       latency, not compute. Here ``reps`` applications run inside ONE
       jitted ``lax.scan`` with a carried data dependency.
    2. Repeating a call with the warmup's exact arguments can be served from
       a remote memoization cache; the timed call uses a DIFFERENT input
       than the compile/warmup call.
    3. ``block_until_ready`` does not always bound completion; a host value
       fetch does.

    ``fn`` maps an array pytree-leaf-compatible input to any pytree.
    """
    import jax.numpy as jnp
    from jax import lax

    def body(z, _):
        out = fn(z)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return z + 1e-30 * jnp.mean(leaf).astype(z.dtype), ()

    run = jax.jit(lambda z: lax.scan(body, z, None, length=reps)[0])
    float(run(x + 1.0).sum())  # compile + complete on a distinct input
    t0 = time.perf_counter()
    float(run(x).sum())
    return (time.perf_counter() - t0) / reps


def slope_time(fn, x, reps_lo: int = 2, reps_hi: int = 10) -> float:
    """Per-application time via the two-length slope of :func:`scan_time`'s
    program — also cancels the fixed dispatch/fetch overhead that a single
    short scan would smear over its reps. Seconds per application."""
    t_lo = scan_time(fn, x, reps=reps_lo) * reps_lo
    t_hi = scan_time(fn, x, reps=reps_hi) * reps_hi
    return (t_hi - t_lo) / (reps_hi - reps_lo)
