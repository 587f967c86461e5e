"""2-D point-mass particle in an obstacle maze.

Counterpart of reference ``src/models/particle.py:12-313``: Euler integration
with velocity or acceleration control, optional control-channel noise,
crash-on-collision freezing against an occupancy grid, and the built-in
quadratic + obstacle cost functions the maze experiments use.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils import obstacle_map as om
from ..utils.spaces import Box
from .base import DynamicsModel, ParamsDict

_INF = float("inf")


@dataclasses.dataclass(frozen=True)
class ParticleModel(DynamicsModel):
    mass: float = 1.0
    control_type: str = "acceleration"  # or "velocity"
    max_speed: float = _INF
    max_accel: float = _INF
    noise_std: Tuple[float, float] = (0.0, 0.0)
    deterministic: bool = True
    can_crash: bool = False
    obstacle_map: Optional[om.ObstacleMap] = None
    init_state: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    target_state: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    cost_params: Tuple[Tuple[str, float], ...] = (
        ("w_qpos", 1.0),
        ("w_qvel", 1.0),
        ("w_qpos_T", 1.0),
        ("w_qvel_T", 1.0),
        ("w_ctrl", 1.0),
        ("w_obs", 1.0),
    )
    uncertain_params: Tuple[str, ...] = ("mass",)

    @staticmethod
    def create(
        *,
        dt: float = 0.05,
        mass: float = 1.0,
        control_type: str = "acceleration",
        max_speed: Optional[float] = None,
        max_accel: Optional[float] = None,
        noise_std=(0.0, 0.0),
        deterministic: bool = True,
        can_crash: bool = False,
        with_obstacle: bool = False,
        obst_preset: Optional[str] = None,
        obst_width: float = 2.0,
        map_size: Tuple[int, int] = (10, 10),
        map_cell_size: float = 0.1,
        init_state=(0.0, 0.0, 0.0, 0.0),
        target_state=(0.0, 0.0, 0.0, 0.0),
        cost_params: Optional[Dict[str, float]] = None,
        uncertain_params: Tuple[str, ...] = ("mass",),
    ) -> "ParticleModel":
        omap = None
        if with_obstacle:
            obstacles = om.obstacle_preset(obst_preset, obst_width) if obst_preset else []
            omap = om.generate_obstacle_map(map_size, obstacles, map_cell_size)
        cp = {
            "w_qpos": 1.0, "w_qvel": 1.0, "w_qpos_T": 1.0,
            "w_qvel_T": 1.0, "w_ctrl": 1.0, "w_obs": 1.0,
        }
        if cost_params:
            cp.update(cost_params)
        return ParticleModel(
            dt=dt,
            mass=mass,
            control_type=control_type,
            max_speed=_INF if max_speed is None else float(max_speed),
            max_accel=_INF if max_accel is None else float(max_accel),
            noise_std=tuple(float(s) for s in noise_std),
            deterministic=deterministic,
            can_crash=can_crash,
            obstacle_map=omap,
            init_state=tuple(float(v) for v in init_state),
            target_state=tuple(float(v) for v in target_state),
            cost_params=tuple(sorted(cp.items())),
            uncertain_params=uncertain_params,
        )

    # -- spaces -----------------------------------------------------------
    @property
    def observation_space(self) -> Box:
        if self.control_type == "velocity":
            return Box.create(2)
        return Box.create(4, low=[-_INF, -_INF, -self.max_speed, -self.max_speed],
                          high=[_INF, _INF, self.max_speed, self.max_speed])

    @property
    def action_space(self) -> Box:
        bound = self.max_speed if self.control_type == "velocity" else self.max_accel
        return Box.create(2, low=-bound, high=bound)

    @property
    def target(self) -> jax.Array:
        return jnp.asarray(self.target_state, jnp.float32)

    def _w(self, name: str) -> float:
        return dict(self.cost_params)[name]

    # -- dynamics (parity: reference particle.py:123-173) ------------------
    def step(self, states, actions, params: ParamsDict = None, key=None):
        m = self.resolve_param(params, "mass", self.mass)
        acts = actions
        if not self.deterministic and key is not None:
            acts = acts + jnp.asarray(self.noise_std) * jax.random.normal(
                key, acts.shape, acts.dtype
            )
        if self.control_type == "acceleration":
            acts = jnp.clip(acts / m, -self.max_accel, self.max_accel)
            x_dot = jnp.concatenate([states[..., 2:], acts], axis=-1)
        else:
            acts = jnp.clip(acts, -self.max_speed, self.max_speed)
            x_dot = acts
        if self.can_crash and self.obstacle_map is not None:
            # crashed particles freeze in place
            collided = om.get_collisions(self.obstacle_map, states[..., 0:2])
            next_states = states + x_dot * self.dt * (1.0 - collided[..., None])
        else:
            next_states = states + x_dot * self.dt
        # the reference clamps the LAST TWO state dims to max_speed regardless
        # of control type (particle.py:171-172) — in velocity mode that is the
        # position; kept for step-level parity (test_reference_parity.py)
        clamped = jnp.clip(next_states[..., -2:], -self.max_speed, self.max_speed)
        return jnp.concatenate([next_states[..., :-2], clamped], axis=-1)

    # -- built-in costs (parity: particle.py:175-204) ----------------------
    def default_inst_cost(self, states, actions=None, **_):
        obst_cost = 0.0
        if self.obstacle_map is not None:
            obst_cost = self._w("w_obs") * om.get_collisions(
                self.obstacle_map, states[..., 0:2]
            )
        if self.control_type == "velocity":
            w_state = jnp.asarray([self._w("w_qpos")] * 2)
        else:
            w_state = jnp.asarray([self._w("w_qpos")] * 2 + [self._w("w_qvel")] * 2)
        delta = states - self.target
        state_cost = jnp.sum(delta * delta * w_state, axis=-1)
        ctrl_cost = 0.0
        if actions is not None:
            ctrl_cost = self._w("w_ctrl") * jnp.sum(actions * actions, axis=-1)
        return state_cost + ctrl_cost + obst_cost

    def default_term_cost(self, states, **_):
        obst_cost = 0.0
        if self.obstacle_map is not None:
            obst_cost = self._w("w_obs") * om.get_collisions(
                self.obstacle_map, states[..., 0:2]
            )
        if self.control_type == "velocity":
            w_term = jnp.asarray([self._w("w_qpos_T")] * 2)
        else:
            w_term = jnp.asarray([self._w("w_qpos_T")] * 2 + [self._w("w_qvel_T")] * 2)
        delta = states - self.target
        return jnp.sum(delta * delta * w_term, axis=-1) + obst_cost
