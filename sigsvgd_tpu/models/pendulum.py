"""1-DoF inverted pendulum (Gym Pendulum-v0 dynamics).

Counterpart of reference ``src/models/pendulum.py:9-106``: uncertain
{g, mass, length}; torque clamped to ±2, angular velocity to ±8.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils.spaces import Box
from .base import DynamicsModel, ParamsDict

_MAX_SPEED = 8.0
_MAX_TORQUE = 2.0


@dataclasses.dataclass(frozen=True)
class PendulumModel(DynamicsModel):
    g: float = 9.8
    mass: float = 1.0
    length: float = 1.0
    uncertain_params: Tuple[str, ...] = ("g", "mass", "length")

    @property
    def observation_space(self) -> Box:
        return Box.create(2, low=[-float("inf"), -_MAX_SPEED], high=[float("inf"), _MAX_SPEED])

    @property
    def action_space(self) -> Box:
        return Box.create(1, low=-_MAX_TORQUE, high=_MAX_TORQUE)

    def step(self, states, actions, params: ParamsDict = None, key=None):
        theta = states[..., 0:1]
        theta_d = states[..., 1:2]
        g = self.resolve_param(params, "g", self.g)
        m = self.resolve_param(params, "mass", self.mass)
        length = self.resolve_param(params, "length", self.length)

        acts = jnp.clip(actions, -_MAX_TORQUE, _MAX_TORQUE)
        theta_dd = (
            -3.0 * g / (2.0 * length) * jnp.sin(theta + jnp.pi)
            + 3.0 / (m * length**2) * acts
        )
        theta_d = jnp.clip(theta_d + self.dt * theta_dd, -_MAX_SPEED, _MAX_SPEED)
        theta = theta + theta_d * self.dt  # semi-implicit: new velocity first
        return jnp.concatenate([theta, theta_d], axis=-1)

    @staticmethod
    def get_obs(states: jax.Array) -> jax.Array:
        """``[θ, θ̇] → [cos θ, sin θ, θ̇]`` (Gym observation convention)."""
        theta = states[..., 0:1]
        theta_d = states[..., 1:2]
        return jnp.concatenate([jnp.cos(theta), jnp.sin(theta), theta_d], axis=-1)

    def swingup_inst_cost(self, states, actions=None, **_):
        """Standard swing-up cost: ``θ² + 0.1 θ̇² + 0.001 u²`` with angle
        wrapped to (-π, π]."""
        theta = jnp.mod(states[..., 0] + jnp.pi, 2.0 * jnp.pi) - jnp.pi
        cost = theta**2 + 0.1 * states[..., 1] ** 2
        if actions is not None:
            cost = cost + 0.001 * jnp.sum(actions * actions, axis=-1)
        return cost

    def swingup_term_cost(self, states, **_):
        theta = jnp.mod(states[..., 0] + jnp.pi, 2.0 * jnp.pi) - jnp.pi
        return theta**2 + 0.1 * states[..., 1] ** 2
