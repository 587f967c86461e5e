"""Likelihood models bridging costs/observations to log-probabilities.

Counterpart of reference ``src/inference/likelihoods.py:9-92``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ExponentiatedUtility:
    """``log p(cost) = -cost / α`` with min-subtraction for stability when a
    batch of costs is given (reference ``likelihoods.py:76-92``)."""

    alpha: float = 1.0

    def log_p(self, costs: jax.Array) -> jax.Array:
        costs = jnp.atleast_1d(costs)
        shifted = jnp.where(costs.size > 1, costs - jnp.min(costs), costs)
        return -shifted / self.alpha


class GaussianObs(NamedTuple):
    """Conditioning state of the Gaussian observation likelihood: the last
    real observation/action pair (reference ``likelihoods.py:48-64``)."""

    past_obs: jax.Array
    past_action: jax.Array
    obs: jax.Array


@dataclasses.dataclass(frozen=True)
class GaussianLikelihood:
    """Observation model ``N(new_obs; model.step(past_obs, action, θ), σ²I)``
    over dynamics parameters θ — the MPF measurement model.

    ``step_fn(states, actions, params) -> next_states`` is the forward model;
    ``params_to_dict`` maps a ``[k, p]`` parameter matrix to the model's params
    pytree (see ``models.base``).
    """

    step_fn: Callable[..., jax.Array]
    params_to_dict: Callable[[jax.Array], Any]
    obs_std: float
    log_space: bool = False

    def condition(self, action: jax.Array, new_obs: jax.Array, prev: GaussianObs = None) -> GaussianObs:
        past = prev.obs if prev is not None else new_obs
        return GaussianObs(past_obs=past, past_action=action, obs=new_obs)

    def sample(self, theta: jax.Array, cond: GaussianObs) -> jax.Array:
        """Predicted next observation per particle θ (``[k, p] -> [k, obs]``)."""
        params = jnp.exp(theta) if self.log_space else theta
        k = theta.shape[0]
        states = jnp.broadcast_to(cond.past_obs, (k,) + cond.past_obs.shape)
        actions = jnp.broadcast_to(cond.past_action, (k,) + cond.past_action.shape)
        return self.step_fn(states, actions, self.params_to_dict(params))

    def log_prob(self, samples: jax.Array, cond: GaussianObs) -> jax.Array:
        """``[k, obs] -> [k]`` Gaussian log-density of the real observation."""
        d = cond.obs.shape[-1]
        var = self.obs_std**2
        diff = samples - cond.obs
        return -0.5 * jnp.sum(diff * diff, axis=-1) / var - 0.5 * d * jnp.log(
            2.0 * jnp.pi * var
        )
