"""MPF — Stein particle filter for online dynamics-parameter inference.

Counterpart of reference ``src/inference/mpf.py:12-86``: particles are
dynamics-parameter hypotheses θ; after every real environment transition the
posterior ``p(θ | obs) ∝ N(obs; f(s, a, θ), σ²I) · GMM-prior(θ)`` is refined
with ``n_steps`` of SVGD, then the GMM prior is rebuilt around the moved
particles. The whole observe-update is one jitted ``lax.scan``.

The prior gradient uses the exact autodiff GMM score — under XLA this fuses
to the handful of elementwise ops the reference needed a C++ module
(``fast_gmm_diff``, ``docs/Benchmark.md``) to approach. We use the standard
SVGD velocity ``(K s − ∇K)/n`` (the reference's ``phi`` at ``mpf.py:56`` has
an inverted repulsion sign and a kernel-call signature mismatch in a code
path its shipped configs never enable).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..kernels import GaussianKernel
from ..utils.math import bw_silverman, gmm_log_prob
from .likelihoods import GaussianLikelihood, GaussianObs


class MPFState(NamedTuple):
    particles: jax.Array  # [k, p] parameter hypotheses (maybe log-space)
    prior_means: jax.Array  # [k, p] GMM component means (last update's particles)
    prior_bw: jax.Array  # scalar component std
    cond: GaussianObs


@dataclasses.dataclass(frozen=True)
class MPF:
    likelihood: GaussianLikelihood
    kernel: GaussianKernel = dataclasses.field(default_factory=GaussianKernel)
    lr: float = 0.01
    bw: Optional[float] = None  # fixed kernel/prior bandwidth; None = Silverman
    bw_scale: float = 1.0

    def _bandwidth(self, particles: jax.Array) -> jax.Array:
        if self.bw is not None:
            return jnp.asarray(self.bw * self.bw_scale, particles.dtype)
        return jnp.mean(bw_silverman(particles, self.bw_scale))

    def init(self, particles: jax.Array, initial_obs: jax.Array) -> MPFState:
        """Initialize from prior samples and the first observation
        (reference ``mpf.py:13-24``)."""
        cond = GaussianObs(
            past_obs=initial_obs,
            past_action=jnp.zeros((0,), particles.dtype),
            obs=initial_obs,
        )
        return MPFState(
            particles=particles,
            prior_means=particles,
            prior_bw=self._bandwidth(particles),
            cond=cond,
        )

    def prior_log_prob(self, state: MPFState, theta: jax.Array) -> jax.Array:
        return gmm_log_prob(
            theta,
            state.prior_means,
            state.prior_bw**2,
            jnp.ones((state.prior_means.shape[0],), theta.dtype),
        )

    def _phi(self, x: jax.Array, state: MPFState, bw: jax.Array) -> jax.Array:
        n = x.shape[0]

        def log_post(theta):
            pred = self.likelihood.sample(theta, state.cond)
            log_lik = jnp.sum(self.likelihood.log_prob(pred, state.cond))
            log_pri = jnp.sum(self.prior_log_prob(state, theta))
            return log_lik + log_pri

        score = jax.grad(log_post)(x)
        k_xx, grad_k = self.kernel(x, x, h=bw)
        return (k_xx @ score.reshape(n, -1) - grad_k).reshape(x.shape) / n

    def observe(
        self,
        state: MPFState,
        action: jax.Array,
        new_obs: jax.Array,
        n_steps: int = 20,
        bw: Optional[float] = None,
    ) -> Tuple[MPFState, jax.Array]:
        """Condition on a real transition and run ``n_steps`` Stein updates.

        Returns the new filter state and the per-step gradient norms
        (parity: ``MPF.optimize``, ``mpf.py:64-86``).
        """
        cond = self.likelihood.condition(action, new_obs, prev=state.cond)
        state = state._replace(cond=cond)
        kern_bw = (
            jnp.asarray(bw * self.bw_scale, state.particles.dtype)
            if bw is not None
            else self._bandwidth(state.particles)
        )

        def body(x, _):
            phi = self._phi(x, state, kern_bw)
            x = x + self.lr * phi
            return x, jnp.linalg.norm(phi)

        particles, grads = lax.scan(body, state.particles, None, length=n_steps)
        new_state = MPFState(
            particles=particles,
            prior_means=particles,
            prior_bw=kern_bw,
            cond=cond,
        )
        return new_state, grads
