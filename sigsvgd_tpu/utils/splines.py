"""Natural cubic splines (knot-space trajectory parameterization).

TPU-native replacement for the reference's ``torchcubicspline`` dependency
(used in ``examples/script_planning_robot.py:118-127`` to turn 5 knots into a
200-step joint trajectory). Coefficients come from the classic tridiagonal
system for the knot second-derivatives, solved with the Thomas algorithm as a
``lax.scan`` (O(n), differentiable, vmap-friendly); evaluation is a gather +
cubic polynomial, all static shapes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class CubicSpline(NamedTuple):
    """Piecewise-cubic coefficients: ``S(t) = y_i + b_i dt + c_i dt² + d_i dt³``
    on ``[t_i, t_{i+1}]`` with ``dt = t - t_i``.

    Shapes: ``t [n]``, ``y [..., n, ch]``, ``b/c/d [..., n-1, ch]``.
    """

    t: jax.Array
    y: jax.Array
    b: jax.Array
    c: jax.Array
    d: jax.Array


def _thomas_solve(lower, diag, upper, rhs):
    """Solve a tridiagonal system via the Thomas algorithm.

    Args:
      lower: ``[m-1]`` sub-diagonal, ``diag``: ``[m]``, ``upper``: ``[m-1]``,
      rhs: ``[m, ch]``.
    Returns ``[m, ch]`` solution. Differentiable (pure scans).
    """
    m = diag.shape[0]
    up = jnp.concatenate([upper, jnp.zeros((1,), diag.dtype)])
    lo = jnp.concatenate([jnp.zeros((1,), diag.dtype), lower])

    def fwd(carry, inp):
        cp_prev, dp_prev = carry
        a, b, c, r = inp
        denom = b - a * cp_prev
        cp = c / denom
        dp = (r - a * dp_prev) / denom
        return (cp, dp), (cp, dp)

    init = (jnp.zeros((), diag.dtype), jnp.zeros((rhs.shape[-1],), rhs.dtype))
    _, (cps, dps) = lax.scan(fwd, init, (lo, diag, up, rhs))

    def bwd(x_next, inp):
        cp, dp = inp
        x = dp - cp * x_next
        return x, x

    _, xs_rev = lax.scan(
        bwd, jnp.zeros((rhs.shape[-1],), rhs.dtype), (cps, dps), reverse=True
    )
    return xs_rev


def natural_cubic_spline_coeffs(t: jax.Array, y: jax.Array) -> CubicSpline:
    """Fit a natural cubic spline through knots ``(t_i, y_i)``.

    Args:
      t: ``[n]`` strictly-increasing knot times.
      y: ``[..., n, ch]`` knot values (leading batch dims are vmapped).

    Natural boundary: second derivative zero at both ends.
    """
    if y.ndim == 2:
        return _coeffs_2d(t, y)
    flat = y.reshape((-1,) + y.shape[-2:])
    out = jax.vmap(lambda yy: _coeffs_2d(t, yy))(flat)
    reshape = lambda a: a.reshape(y.shape[:-2] + a.shape[1:])
    return CubicSpline(t, y, reshape(out.b), reshape(out.c), reshape(out.d))


def _coeffs_2d(t: jax.Array, y: jax.Array) -> CubicSpline:
    n, ch = y.shape
    h = t[1:] - t[:-1]  # [n-1]
    if n == 2:
        b = (y[1:] - y[:-1]) / h[:, None]
        z = jnp.zeros_like(b)
        return CubicSpline(t, y, b, z, z)
    slope = (y[1:] - y[:-1]) / h[:, None]  # [n-1, ch]
    rhs = slope[1:] - slope[:-1]  # [n-2, ch]
    diag = (h[:-1] + h[1:]) / 3.0
    off = h[1:-1] / 6.0
    m_inner = _thomas_solve(off, diag, off, rhs)  # [n-2, ch]
    m = jnp.concatenate([jnp.zeros((1, ch), y.dtype), m_inner, jnp.zeros((1, ch), y.dtype)])
    b = slope - h[:, None] * (2.0 * m[:-1] + m[1:]) / 6.0
    c = m[:-1] / 2.0
    d = (m[1:] - m[:-1]) / (6.0 * h[:, None])
    return CubicSpline(t, y, b, c, d)


def _locate(t: jax.Array, tq: jax.Array):
    idx = jnp.clip(jnp.searchsorted(t, tq, side="right") - 1, 0, t.shape[0] - 2)
    return idx, tq - t[idx]


def spline_evaluate(spline: CubicSpline, tq: jax.Array) -> jax.Array:
    """Evaluate at query times ``tq [m]`` → ``[..., m, ch]``."""
    idx, dt = _locate(spline.t, tq)
    dt = dt[:, None]
    y = jnp.take(spline.y, idx, axis=-2)
    b = jnp.take(spline.b, idx, axis=-2)
    c = jnp.take(spline.c, idx, axis=-2)
    d = jnp.take(spline.d, idx, axis=-2)
    return y + dt * (b + dt * (c + dt * d))


def spline_derivative(spline: CubicSpline, tq: jax.Array, order: int = 1) -> jax.Array:
    """First or second derivative at ``tq [m]`` → ``[..., m, ch]``."""
    idx, dt = _locate(spline.t, tq)
    dt = dt[:, None]
    b = jnp.take(spline.b, idx, axis=-2)
    c = jnp.take(spline.c, idx, axis=-2)
    d = jnp.take(spline.d, idx, axis=-2)
    if order == 1:
        return b + dt * (2.0 * c + 3.0 * dt * d)
    if order == 2:
        return 2.0 * c + 6.0 * dt * d
    raise ValueError("order must be 1 or 2")


def spline_trajectory(knots: jax.Array, timesteps: int) -> jax.Array:
    """Knots ``[..., n, ch]`` → uniformly-sampled trajectory ``[..., T, ch]``.

    Knot times are ``linspace(0, 1, n)`` and query times ``linspace(0, 1, T)``
    (parity: reference ``script_planning_robot.py:118-127``).
    """
    n = knots.shape[-2]
    t = jnp.linspace(0.0, 1.0, n)
    spline = natural_cubic_spline_coeffs(t, knots)
    tq = jnp.linspace(0.0, 1.0, timesteps)
    return spline_evaluate(spline, tq)
