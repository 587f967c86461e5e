"""Merwe-scaled unscented transform (sigma-point rollouts for DISCO).

Functional counterpart of the reference's ``src/utils/utf.py:6-137``: weights
are computed once at trace time; sigma-point generation and the inverse
transform are pure jittable functions.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MerweScaledUTF:
    """Sigma-point transformer: ``2n+1`` points for an ``n``-dim distribution.

    Default ``alpha=1.0`` (λ=0 ⇒ bounded weights), NOT the reference's
    ``1e-3`` (``utf.py:19``): with α=1e-3 the weights are ±O(1/α²)≈1e6 and
    both the inverse transform and the sigma-weighted cost aggregation
    cancel catastrophically in fp32 — unusable on TPU (and silently
    inaccurate in the reference's own fp32 CUDA path).
    """

    n: int
    alpha: float = 1.0
    beta: float = 2.0
    kappa: float = 0.0

    @property
    def pts(self) -> int:
        return 2 * self.n + 1

    @property
    def _lambda(self) -> float:
        return self.alpha ** 2 * (self.n + self.kappa) - self.n

    @property
    def loc_weights(self) -> jax.Array:
        lam, n = self._lambda, self.n
        w = jnp.full((self.pts,), 0.5 / (n + lam), dtype=jnp.float32)
        return w.at[0].set(lam / (n + lam))

    @property
    def cov_weights(self) -> jax.Array:
        lam, n = self._lambda, self.n
        w = jnp.full((self.pts,), 0.5 / (n + lam), dtype=jnp.float32)
        return w.at[0].set(lam / (n + lam) + (1.0 - self.alpha ** 2 + self.beta))

    def compute_sigma_points(self, mu: jax.Array, cov: jax.Array) -> jax.Array:
        """Sigma points for ``N(mu, cov)`` → ``[n, 2n+1]`` (cols are points).

        Offsets are the *columns* of the lower Cholesky factor ``L`` of
        ``(λ+n)·cov`` so that ``Σ_i l_i l_iᵀ = L Lᵀ = (λ+n)·cov`` and the
        inverse transform recovers the covariance exactly. (The reference,
        ``utf.py:112-118``, offsets by columns of the *upper* factor, whose
        column outer-product sum is ``U Uᵀ ≠ (λ+n)·cov`` — a transposition
        slip; we keep the mathematically consistent form.)
        """
        n = self.n
        low = jnp.linalg.cholesky((self._lambda + n) * cov)
        mu_col = mu.reshape(-1, 1)
        return jnp.concatenate([mu_col, low + mu_col, -low + mu_col], axis=1)

    def unscented_transform(self, sigmas: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Recover ``(mean, cov)`` from transformed sigma points ``[n, 2n+1]``.

        Computed against the central point: with the default tiny ``alpha`` the
        weights are ±O(1/α²) and the textbook ``sigmas @ w`` form loses ~6
        digits to cancellation in fp32; anchoring at ``sigmas[:, 0]`` keeps the
        summands O(α)·O(1/α²)·small and the result fp32-stable on TPU.
        """
        center = sigmas[:, 0:1]
        mu = center[:, 0] + (sigmas - center) @ self.loc_weights
        resid = sigmas - mu.reshape(-1, 1)
        cov = (resid * self.cov_weights[None, :]) @ resid.T
        return mu, cov
