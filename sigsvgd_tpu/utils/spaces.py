"""Bounded box spaces (observation / action spaces).

JAX counterpart of the reference's ``src/utils/spaces.py:4-65``: a static
(hashable) description of a box, safe to close over inside ``jit``.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Box:
    """A ``dim``-dimensional box with per-dimension bounds.

    Bounds are stored as (hashable) tuples of floats so a ``Box`` can be a
    static argument to jitted functions; use :attr:`low` / :attr:`high` for
    array views.
    """

    dim: int
    low_t: Tuple[float, ...]
    high_t: Tuple[float, ...]

    @staticmethod
    def create(dim: int, low=None, high=None) -> "Box":
        if dim <= 0:
            raise ValueError("Box dimension must be a positive integer.")

        def _expand(v, default):
            if v is None:
                return (default,) * dim
            arr = np.asarray(v, dtype=np.float64).reshape(-1)
            if arr.size == 1:
                return (float(arr[0]),) * dim
            if arr.size != dim:
                raise ValueError(f"Bounds must be scalar or length-{dim}.")
            return tuple(float(a) for a in arr)

        return Box(dim, _expand(low, -np.inf), _expand(high, np.inf))

    @property
    def low(self) -> jax.Array:
        return jnp.asarray(self.low_t, dtype=jnp.float32)

    @property
    def high(self) -> jax.Array:
        return jnp.asarray(self.high_t, dtype=jnp.float32)

    @property
    def shape(self) -> Tuple[int, ...]:
        return (self.dim,)

    @property
    def bounded(self) -> bool:
        return all(np.isfinite(self.low_t)) and all(np.isfinite(self.high_t))

    def clip(self, x: jax.Array) -> jax.Array:
        return jnp.clip(x, self.low, self.high)

    def sample(self, key: jax.Array, batch_shape: Tuple[int, ...] = ()) -> jax.Array:
        """Uniform sample; unbounded dims fall back to a standard normal."""
        shape = tuple(batch_shape) + (self.dim,)
        if self.bounded:
            return jax.random.uniform(
                key, shape, minval=self.low, maxval=self.high, dtype=jnp.float32
            )
        return jax.random.normal(key, shape, dtype=jnp.float32)
