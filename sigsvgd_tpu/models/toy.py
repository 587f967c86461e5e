"""Analytic 2-D target densities for SVGD correctness tests.

Counterpart of reference ``src/models/environment.py:7-175`` (double-banana,
sine, star-Gaussian): each provides ``logp``, ``grad_log_p`` and
``hessian_log_p`` in closed form / via autodiff.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DoubleBanana:
    """Rosenbrock-warped likelihood: ``F(x) = log((a-x₁)² + b(x₂-x₁²)²)`` with
    a Gaussian prior and observation ``y`` (reference ``environment.py:7-46``)."""

    a: float = 1.0
    b: float = 100.0
    prior_var: float = 1.0
    y_var: float = 0.09
    y: float = math.log(30.0)

    def f(self, x: jax.Array) -> jax.Array:
        x1, x2 = x[..., 0], x[..., 1]
        return jnp.log((self.a - x1) ** 2 + self.b * (x2 - x1**2) ** 2 + 1e-10)

    def logp(self, x: jax.Array) -> jax.Array:
        fx = self.f(x)
        return (
            -jnp.sum(x * x, axis=-1) / (2.0 * self.prior_var)
            - (fx - self.y) ** 2 / (2.0 * self.y_var)
        )

    def grad_log_p(self, x: jax.Array) -> jax.Array:
        return jax.grad(lambda xx: jnp.sum(self.logp(xx)))(x)

    def hessian_log_p(self, x: jax.Array) -> jax.Array:
        return jax.vmap(jax.hessian(lambda xx: self.logp(xx[None])[0]))(x)


@dataclasses.dataclass(frozen=True)
class Sine:
    """``F(x) = (x₂ + sin x₁)²`` likelihood with Gaussian prior
    (reference ``environment.py:49-87``)."""

    prior_var: float = 1.0
    y_var: float = 0.09

    def logp(self, x: jax.Array) -> jax.Array:
        fx = (x[..., 1] + jnp.sin(x[..., 0])) ** 2
        return -jnp.sum(x * x, axis=-1) / (2.0 * self.prior_var) - fx**2 / (
            2.0 * self.y_var
        )

    def grad_log_p(self, x: jax.Array) -> jax.Array:
        return jax.grad(lambda xx: jnp.sum(self.logp(xx)))(x)


def star_gaussian(skewness: float = 100.0, n_components: int = 5) -> "StarGaussian":
    """Ring of rotated anisotropic Gaussians (reference ``environment.py:90-175``)."""
    theta = 2.0 * jnp.pi / n_components
    c, s = jnp.cos(theta), jnp.sin(theta)
    u = jnp.array([[c, s], [-s, c]])
    mus = [jnp.array([1.5, 0.0])]
    sigmas = [jnp.diag(jnp.array([1.0, 1.0 / skewness]))]
    for _ in range(1, n_components):
        mus.append(u @ mus[-1])
        sigmas.append(u @ sigmas[-1] @ u.T)
    return StarGaussian(
        mus=jnp.stack(mus), sigmas=jnp.stack(sigmas)
    )


@jax.tree_util.register_pytree_node_class
class StarGaussian:
    def __init__(self, mus: jax.Array, sigmas: jax.Array):
        self.mus = mus  # [k, 2]
        self.sigmas = sigmas  # [k, 2, 2]

    def tree_flatten(self):
        return (self.mus, self.sigmas), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def logp(self, x: jax.Array) -> jax.Array:
        def comp_logp(mu, sigma):
            diff = x - mu
            prec = jnp.linalg.inv(sigma)
            quad = -0.5 * jnp.einsum("...i,ij,...j->...", diff, prec, diff)
            logdet = jnp.linalg.slogdet(sigma)[1]
            return quad - 0.5 * (logdet + 2.0 * jnp.log(2.0 * jnp.pi))

        comp = jax.vmap(comp_logp)(self.mus, self.sigmas)  # [k, ...]
        return jax.nn.logsumexp(comp, axis=0) - jnp.log(self.mus.shape[0])

    def grad_log_p(self, x: jax.Array) -> jax.Array:
        return jax.grad(lambda xx: jnp.sum(self.logp(xx)))(x)

    def sample(self, key: jax.Array, n: int) -> jax.Array:
        k = self.mus.shape[0]
        key_c, key_n = jax.random.split(key)
        comps = jax.random.randint(key_c, (n,), 0, k)
        chols = jnp.linalg.cholesky(self.sigmas)
        eps = jax.random.normal(key_n, (n, 2))
        return self.mus[comps] + jnp.einsum("nij,nj->ni", chols[comps], eps)
