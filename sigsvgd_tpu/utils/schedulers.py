"""Annealing schedules for the SVGD repulsion term.

Pure functions of the step index (so they compose with ``lax.scan`` instead of
mutating an epoch counter like the reference's ``src/utils/scheduler.py:4-87``).
Each factory returns ``schedule(step) -> value``.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def constant(value: float = 1.0) -> Schedule:
    def schedule(step):
        return jnp.full((), value, dtype=jnp.float32)

    return schedule


def square_root(base: float) -> Schedule:
    """``ρ_t = ρ₀ (t+1)^(-1/2)`` (reference ``scheduler.py:4-22``)."""

    def schedule(step):
        return base * (step + 1.0) ** -0.5

    return schedule


def factor(base: float, gamma: float, minimum: float = 1e-7) -> Schedule:
    """``ρ_t = max(ρ_min, ρ₀ γ^t)`` (reference ``scheduler.py:25-47``)."""

    def schedule(step):
        return jnp.maximum(minimum, base * gamma ** step)

    return schedule


def cosine(
    base: float, target: float, final_step: int, warmup_steps: int = 0
) -> Schedule:
    """Loshchilov–Hutter cosine anneal with warmup plateau.

    ``ρ_t = ρ_T + (ρ₀-ρ_T)/2 (1 + cos(π (t-warmup)/T))`` for
    ``warmup < t ≤ final_step``, constant ``ρ₀`` before and ``ρ_T`` after
    (reference ``scheduler.py:50-87``; note the reference divides the phase by
    ``final_epoch``, not ``final_epoch - warmup`` — we match that).
    """

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        phase = jnp.pi * (step - warmup_steps) / final_step
        mid = target + 0.5 * (base - target) * (1.0 + jnp.cos(phase))
        val = jnp.where(step <= warmup_steps, base, mid)
        return jnp.where(step > final_step, target, val)

    return schedule
