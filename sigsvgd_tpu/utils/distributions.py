"""Minimal distribution pytrees for uncertain dynamics parameters.

The reference passes ``torch.distributions`` objects into controllers; here a
distribution is a small NamedTuple (a pytree — jit/vmap friendly) with free
functions for sampling and log-density.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp

from .math import gmm_log_prob


class Gaussian(NamedTuple):
    """Multivariate normal; ``cov`` may be ``[p, p]`` or diagonal ``[p]``."""

    mean: jax.Array
    cov: jax.Array

    @property
    def dim(self) -> int:
        return self.mean.shape[-1]


class ParticleGMM(NamedTuple):
    """Equal-bandwidth mixture over particles (the MPF posterior / DuSt prior)."""

    means: jax.Array  # [k, p]
    var: jax.Array  # scalar or [p]
    weights: jax.Array  # [k]


Distribution = Union[Gaussian, ParticleGMM]


def sample(dist: Distribution, key: jax.Array, shape: Tuple[int, ...]) -> jax.Array:
    shape = tuple(shape)
    if isinstance(dist, Gaussian):
        if dist.cov.ndim == 2:
            chol = jnp.linalg.cholesky(dist.cov)
            eps = jax.random.normal(key, shape + dist.mean.shape, dist.mean.dtype)
            return dist.mean + eps @ chol.T
        std = jnp.sqrt(dist.cov)
        eps = jax.random.normal(key, shape + dist.mean.shape, dist.mean.dtype)
        return dist.mean + eps * std
    if isinstance(dist, ParticleGMM):
        key_c, key_n = jax.random.split(key)
        logits = jnp.log(dist.weights)
        comps = jax.random.categorical(key_c, logits, shape=shape)
        eps = jax.random.normal(
            key_n, shape + dist.means.shape[-1:], dist.means.dtype
        )
        return dist.means[comps] + eps * jnp.sqrt(dist.var)
    raise TypeError(f"Unknown distribution type: {type(dist)}")


def log_prob(dist: Distribution, x: jax.Array) -> jax.Array:
    if isinstance(dist, Gaussian):
        diff = x - dist.mean
        if dist.cov.ndim == 2:
            sol = jnp.linalg.solve(dist.cov, diff[..., None])[..., 0]
            quad = jnp.sum(diff * sol, axis=-1)
            logdet = jnp.linalg.slogdet(dist.cov)[1]
        else:
            quad = jnp.sum(diff * diff / dist.cov, axis=-1)
            logdet = jnp.sum(jnp.log(dist.cov))
        d = dist.mean.shape[-1]
        return -0.5 * (quad + logdet + d * jnp.log(2.0 * jnp.pi))
    if isinstance(dist, ParticleGMM):
        flat = x.reshape(-1, x.shape[-1])
        lp = gmm_log_prob(flat, dist.means, dist.var, dist.weights)
        return lp.reshape(x.shape[:-1])
    raise TypeError(f"Unknown distribution type: {type(dist)}")


def sample_rejection(
    dist: Distribution,
    key: jax.Array,
    shape: Tuple[int, ...],
    low: float = -jnp.inf,
    high: float = jnp.inf,
    max_rounds: int = 50,
) -> jax.Array:
    """Rejection sampling within ``[low, high]`` bounds (jittable).

    Counterpart of the reference's ``BaseModel.rejection_sampling``
    (``src/models/base.py:102-147``): out-of-bounds draws are redrawn for up
    to ``max_rounds`` fixed-shape rounds (then clipped — a bounded-compute
    compromise vs the reference's unbounded Python while-loop).
    """

    def in_bounds(x):
        return jnp.all((x >= low) & (x <= high), axis=-1, keepdims=True)

    def body(carry, sub):
        x = carry
        y = sample(dist, sub, shape)
        x = jnp.where(in_bounds(x), x, y)
        return x, None

    key, k0 = jax.random.split(key)
    x0 = sample(dist, k0, shape)
    x, _ = jax.lax.scan(body, x0, jax.random.split(key, max_rounds))
    return jnp.clip(x, low, high)


def moments(dist: Distribution) -> Tuple[jax.Array, jax.Array]:
    """``(mean, covariance)`` — what the UTF sigma-point rollouts consume."""
    if isinstance(dist, Gaussian):
        cov = dist.cov if dist.cov.ndim == 2 else jnp.diag(dist.cov)
        return dist.mean, cov
    if isinstance(dist, ParticleGMM):
        w = dist.weights / jnp.sum(dist.weights)
        mean = jnp.sum(w[:, None] * dist.means, axis=0)
        diff = dist.means - mean
        cov = jnp.einsum("k,ki,kj->ij", w, diff, diff)
        cov = cov + jnp.diag(jnp.broadcast_to(dist.var, (dist.means.shape[-1],)))
        return mean, cov
    raise TypeError(f"Unknown distribution type: {type(dist)}")
