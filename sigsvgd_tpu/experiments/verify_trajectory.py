"""Ground-truth trajectory verification against the exact oracles.

Counterpart of reference ``examples/script_verify_robot_traj_with_pybullet.py``
+ ``compile_robot_results_collisions.py:35-60``: optimized trajectories are
replayed against the *exact* scene SDF (hard occupancy, not the learned/soft
cost) and the exact capsule self-collision oracle, reporting per-waypoint
collision counts — the strongest correctness oracle in the pipeline.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.robot.panda import PandaRobot
from ..models.robot.scene import Scene, scene_occupancy
from ..models.robot.self_collision import self_collision
from ..utils.splines import spline_trajectory
from .planning import create_body_points


def verify_knot_trajectories(
    robot: PandaRobot,
    scene: Scene,
    q_start: jax.Array,
    q_target: jax.Array,
    knots: jax.Array,
    timesteps: int = 200,
    n_body_points: int = 10,
    margin: float = 0.0,
) -> Dict[str, np.ndarray]:
    """Exact collision audit of knot particles ``[batch, n_free, dof]``.

    Returns per-particle waypoint collision fractions and overall validity.
    """
    batch = knots.shape[0]
    full = jnp.concatenate(
        [
            jnp.broadcast_to(q_start, (batch, 1, knots.shape[-1])),
            knots,
            jnp.broadcast_to(q_target, (batch, 1, knots.shape[-1])),
        ],
        axis=1,
    )
    qs = spline_trajectory(full, timesteps)  # [batch, T, dof]
    xs = robot.qs_to_joints_xs(qs)
    body = create_body_points(xs, n_body_points)  # [batch, T, P, 3]
    env_hit = scene_occupancy(scene, body, margin).max(-1)  # [batch, T]
    self_hit = self_collision(robot, qs)  # [batch, T]

    env_frac = np.asarray(env_hit.mean(-1))
    self_frac = np.asarray(self_hit.mean(-1))
    valid = np.asarray((env_hit.max(-1) == 0) & (self_hit.max(-1) == 0))
    return {
        "env_collision_fraction": env_frac,
        "self_collision_fraction": self_frac,
        "collision_free": valid,
        "n_valid": int(valid.sum()),
    }
