"""Forward-model protocol and uncertain-parameter plumbing.

Counterpart of reference ``src/models/base.py:6-183``. Models here are frozen
dataclasses (static config only — hashable, safe to close over in jit) with a
pure ``step(states, actions, params)`` function; batching comes from leading
array dimensions (or ``vmap``), never from model state.

Uncertain parameters travel as a dict ``{name: [k, 1] array}`` built from a
``[k, p]`` sample matrix (``params_to_dict`` parity, ``base.py:173-177``), so
the same ``step`` evaluates k parameter hypotheses against k (batched)
states via broadcasting.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.spaces import Box

ParamsDict = Optional[Dict[str, jax.Array]]


@dataclasses.dataclass(frozen=True)
class DynamicsModel:
    """Base class: subclasses define ``observation_space``, ``action_space``,
    ``step`` and the ordered ``uncertain_params`` tuple."""

    dt: float = 0.05
    uncertain_params: Tuple[str, ...] = ()

    # -- to be overridden --------------------------------------------------
    @property
    def observation_space(self) -> Box:
        raise NotImplementedError

    @property
    def action_space(self) -> Box:
        raise NotImplementedError

    def step(
        self,
        states: jax.Array,
        actions: jax.Array,
        params: ParamsDict = None,
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        raise NotImplementedError

    # -- shared plumbing ---------------------------------------------------
    @property
    def dim_s(self) -> int:
        return self.observation_space.dim

    @property
    def dim_a(self) -> int:
        return self.action_space.dim

    def params_to_dict(self, params: jax.Array) -> Dict[str, jax.Array]:
        """``[k, p]`` sample matrix → ``{name: [k, 1]}`` broadcastable columns."""
        params = jnp.atleast_2d(params)
        return {
            name: params[:, i].reshape(-1, 1)
            for i, name in enumerate(self.uncertain_params)
        }

    def dict_to_params(self, params_dict: Dict[str, jax.Array]) -> jax.Array:
        return jnp.concatenate(
            [jnp.atleast_2d(params_dict[name]) for name in self.uncertain_params],
            axis=-1,
        )

    def resolve_param(self, params: ParamsDict, name: str, default: float):
        """Sampled value if present else the model default (a scalar)."""
        if params is not None and name in params:
            return params[name]
        return default
