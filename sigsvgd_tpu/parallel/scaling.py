"""Scaling measurement + communication accounting for the sharded solvers.

BASELINE.json targets ≥0.8 scaling efficiency on solves/s at N≥2 hosts. Real
multi-chip hardware is not available in this image, so two proxies are
maintained (VERDICT r1 item 5):

  * :func:`collective_stats` — parse the compiled HLO of a sharded step and
    account every collective (op kind, count, payload bytes). Communication
    volume per step/device is a hardware-independent invariant of the
    program; a regression test pins it (tests/test_parallel_scaling.py).
  * :func:`measure_scaling` — solves/s at 1/2/4/8 devices on the virtual CPU
    mesh. CPU "devices" share host cores, so absolute efficiency is NOT the
    ICI number — the value of the curve is catching superlinear comm growth
    or sharding bugs, not predicting pod efficiency.
"""
from __future__ import annotations

import re
import time
from typing import Callable, Dict, List, Sequence

import jax
import numpy as np

_COLLECTIVES = ("all-gather", "all-reduce", "collective-permute", "all-to-all",
                "reduce-scatter")

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "f64": 8, "s32": 4, "u32": 4,
                "pred": 1, "s8": 1, "u8": 1}


def _shape_bytes(shape_str: str) -> int:
    """``f32[8,321]{...}`` → payload bytes."""
    m = re.match(r"([a-z0-9]+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4)


def collective_stats(compiled) -> Dict[str, Dict[str, int]]:
    """Count collectives and payload bytes in compiled HLO.

    Args:
      compiled: result of ``jax.jit(fn).lower(*args).compile()``.

    Returns:
      ``{op_kind: {"count": n, "bytes": total_payload_bytes}}`` — bytes are
      the summed output payloads of each collective instruction (per device).
    """
    text = compiled.as_text()
    stats: Dict[str, Dict[str, int]] = {}
    for line in text.splitlines():
        stripped = line.strip()
        for kind in _COLLECTIVES:
            # match the op name after '=' (e.g. '%ag = f32[...] all-gather(')
            m = re.search(r"=\s*([a-z0-9fbsu]+\[[^\]]*\])[^=]*\b" + kind + r"\(",
                          stripped)
            if m:
                d = stats.setdefault(kind, {"count": 0, "bytes": 0})
                d["count"] += 1
                d["bytes"] += _shape_bytes(m.group(1))
    return stats


def measure_scaling(
    make_step: Callable[[int], Callable],
    device_counts: Sequence[int] = (1, 2, 4, 8),
    n_iters: int = 5,
) -> List[Dict[str, float]]:
    """Steady-state solves/s for a sharded step at several device counts.

    ``make_step(n_devices)`` must return a zero-arg callable running one
    jitted solve (already closed over its inputs) whose output is blocked on.
    """
    rows = []
    for nd in device_counts:
        if nd > len(jax.devices()):
            continue
        step = make_step(nd)
        step()  # compile
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = step()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n_iters
        rows.append({"devices": nd, "solves_per_s": 1.0 / dt, "s_per_solve": dt})
    base = rows[0]["solves_per_s"] if rows else 1.0
    for r in rows:
        r["efficiency_vs_1dev"] = r["solves_per_s"] / (base * r["devices"])
    return rows
