"""Static kernels with analytic gradients: Gaussian/IMQ, plain and metric-scaled.

TPU-native counterpart of the reference's ``src/kernels/_kernels.py:12-299``.
Each kernel is a frozen dataclass whose ``__call__(X, Y, ...)`` returns either
the Gram matrix ``K [n, m]`` or ``(K, dK)`` where
``dK[i] = Σ_j ∂k(X_i, Y_j)/∂X_i`` (shape ``[n, d]`` — already aggregated over
the second argument, the form the SVGD update consumes).

Everything is pure and jittable; the median-heuristic bandwidth is a reduction
inside jit (data-dependent value, static shape).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..utils.math import bw_median, pw_dist_sq, scaled_pw_dist_sq

BandwidthFn = Callable[[jax.Array], jax.Array]


def _as2d(x: jax.Array) -> jax.Array:
    x = jnp.atleast_2d(x)
    return x.reshape(x.shape[0], -1)


@dataclasses.dataclass(frozen=True)
class BaseKernel:
    """Shared bandwidth plumbing. ``bandwidth_fn`` maps the pairwise squared
    distances to a scalar ``h``; defaults to the median heuristic
    (reference ``_kernels.py:31-42``)."""

    bandwidth_fn: Optional[BandwidthFn] = None
    bw_scale: float = 1.0
    analytic_grad: bool = True

    def bandwidth(self, sq_dists: jax.Array, h=None) -> jax.Array:
        if h is not None:
            return jnp.asarray(h, dtype=sq_dists.dtype)
        if self.bandwidth_fn is not None:
            return jnp.asarray(self.bandwidth_fn(sq_dists), dtype=sq_dists.dtype)
        return bw_median(sq_dists, self.bw_scale)


@dataclasses.dataclass(frozen=True)
class GaussianKernel(BaseKernel):
    r"""``k(x, y) = exp(-0.5 ||x - y||² / h²)`` with analytic gradient
    ``∂k/∂x = -(x - y)/h² · k`` (reference ``_kernels.py:64-115``)."""

    def __call__(self, X, Y, h=None, compute_grad: bool = True, **_):
        X, Y = _as2d(X), _as2d(Y)
        d2 = pw_dist_sq(X, Y)
        h = self.bandwidth(d2, h)
        K = jnp.exp(-0.5 * d2 / h**2)
        if not compute_grad:
            return K
        # Σ_j -(x_i - y_j) K_ij = K @ Y - rowsum(K) ⊙ x_i : two matmuls, no
        # [n, m, d] intermediate (the naive einsum is the memory hot spot at
        # 1k+ particles)
        dK = (
            jnp.matmul(K, Y, precision="highest")
            - jnp.sum(K, axis=1, keepdims=True) * X
        ) / h**2
        return K, dK


@dataclasses.dataclass(frozen=True)
class ScaledGaussianKernel(BaseKernel):
    r"""``k(x, y) = exp(-0.5 (x-y) M (x-y)^T / h²)`` with a (symmetrized) metric
    ``M`` — the second-order/matrix-SVGD kernel (reference ``_kernels.py:118-187``).

    Note: like the reference, the returned kernel is *not* pre-multiplied by
    ``M⁻¹``; preconditioning happens in the sampler via a linear solve.
    """

    def __call__(self, X, Y, M=None, h=None, compute_grad: bool = True, **_):
        X, Y = _as2d(X), _as2d(Y)
        d = X.shape[-1]
        if M is None:
            M = jnp.eye(d, dtype=X.dtype)
        else:
            M = 0.5 * (M + M.T)  # PSD stabilization
        d2 = scaled_pw_dist_sq(X, Y, M)
        h = self.bandwidth(d2, h)
        K = jnp.exp(-0.5 * d2 / h**2)
        if not compute_grad:
            return K
        # Σ_j -(x_i - y_j)M K_ij = (K @ Y - rowsum(K) ⊙ x_i) @ M
        dK = (
            jnp.matmul(
                jnp.matmul(K, Y, precision="highest")
                - jnp.sum(K, axis=1, keepdims=True) * X,
                M,
                precision="highest",
            )
            / h**2
        )
        return K, dK


@dataclasses.dataclass(frozen=True)
class IMQKernel(BaseKernel):
    r"""Inverse multiquadric ``k(x, y) = (1 + 0.5 ||x-y||²/h²)^(-1/2)``.

    The analytic gradient is ``∂k/∂x = -0.5 (1 + 0.5 d²/h²)^{-3/2} (x-y)/h²``
    (the true derivative w.r.t. ``x``; the reference's ``_kernels.py:236`` uses
    ``(y - x)`` — a sign slip in a code path no controller exercises — we keep
    the mathematically consistent convention used by its Gaussian kernel).
    """

    def __call__(self, X, Y, h=None, compute_grad: bool = True, **_):
        X, Y = _as2d(X), _as2d(Y)
        d2 = pw_dist_sq(X, Y)
        h = self.bandwidth(d2, h)
        denom = 1.0 + 0.5 * d2 / h**2
        K = denom**-0.5
        if not compute_grad:
            return K
        W = -0.5 * denom**-1.5 / h**2
        dK = jnp.sum(W, axis=1, keepdims=True) * X - jnp.matmul(
            W, Y, precision="highest"
        )
        return K, dK


@dataclasses.dataclass(frozen=True)
class ScaledIMQKernel(BaseKernel):
    r"""Metric-scaled IMQ ``k(x, y) = (1 + 0.5 (x-y)M(x-y)^T/h²)^(-1/2)``
    (reference ``_kernels.py:242-299``). Unlike plain IMQ, the reference's
    scaled variant differentiates w.r.t. ``X`` correctly (its ``:291`` uses
    ``diff @ M`` with ``diff = X - Y``), so our gradient matches it exactly
    (``test_reference_parity.py``). One deviation: we symmetrize ``M`` like
    the reference's ScaledGaussian does (its ScaledIMQ's ``M.to(...)`` at
    ``:287`` is a no-op that drops the stabilization)."""

    def __call__(self, X, Y, M=None, h=None, compute_grad: bool = True, **_):
        X, Y = _as2d(X), _as2d(Y)
        d = X.shape[-1]
        if M is None:
            M = jnp.eye(d, dtype=X.dtype)
        else:
            M = 0.5 * (M + M.T)
        d2 = scaled_pw_dist_sq(X, Y, M)
        h = self.bandwidth(d2, h)
        denom = 1.0 + 0.5 * d2 / h**2
        K = denom**-0.5
        if not compute_grad:
            return K
        W = -0.5 * denom**-1.5 / h**2
        dK = jnp.matmul(
            jnp.sum(W, axis=1, keepdims=True) * X
            - jnp.matmul(W, Y, precision="highest"),
            M,
            precision="highest",
        )
        return K, dK
