"""Franka Panda binding: 7 actuated joints, 9 tracked links.

Counterpart of reference ``PandaRobot`` (``robot_simulator.py:314-349``). The
URDF is a standard public asset (franka_description / moveit_resources);
a copy is vendored under ``robot_resources/panda/`` at the repo root so the
package is self-contained, overridable via ``SIGSVGD_TPU_PANDA_URDF`` or an
explicit argument.
"""
from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .kinematics import fk_positions, fk_poses
from .urdf import KinematicChain, parse_urdf

_DEFAULT_URDF_CANDIDATES = (
    os.environ.get("SIGSVGD_TPU_PANDA_URDF", ""),
    # vendored copy (repo root)
    str(
        Path(__file__).resolve().parents[3]
        / "robot_resources/panda/urdf/panda.urdf"
    ),
)

TARGET_LINKS = (
    "panda_link1",
    "panda_link2",
    "panda_link3",
    "panda_link4",
    "panda_link5",
    "panda_link6",
    "panda_link7",
    "panda_link8",
    "panda_hand",
)
TARGET_JOINTS = tuple(f"panda_joint{i}" for i in range(1, 8))


def _find_urdf(urdf_path: Optional[str]) -> Path:
    if urdf_path:
        return Path(urdf_path)
    for cand in _DEFAULT_URDF_CANDIDATES:
        if cand and Path(cand).exists():
            return Path(cand)
    raise FileNotFoundError(
        "Panda URDF not found; set SIGSVGD_TPU_PANDA_URDF or pass urdf_path"
    )


@dataclasses.dataclass(frozen=True, eq=False)
class PandaRobot:
    """Static Panda description + jittable FK helpers."""

    chain: KinematicChain
    target_link_indices: Tuple[int, ...]

    @staticmethod
    def create(urdf_path: Optional[str] = None) -> "PandaRobot":
        chain = parse_urdf(_find_urdf(urdf_path))
        # sanity: q columns must line up with panda_joint1..7
        assert chain.actuated_names[:7] == TARGET_JOINTS, chain.actuated_names
        idx = tuple(chain.link_index(l) for l in TARGET_LINKS)
        return PandaRobot(chain=chain, target_link_indices=idx)

    @property
    def dof(self) -> int:
        return 7

    def joint_limits(self) -> Tuple[jax.Array, jax.Array]:
        return (
            jnp.asarray(self.chain.lower[:7], jnp.float32),
            jnp.asarray(self.chain.upper[:7], jnp.float32),
        )

    def velocity_limits(self) -> jax.Array:
        """Per-joint speed limits from the URDF — matches the published
        MoveIt ``joint_limits.yaml`` (vendored under
        ``robot_resources/panda/config/``; parity test in test_robot.py)."""
        return jnp.asarray(self.chain.velocity[:7], jnp.float32)

    def _pad_q(self, qs: jax.Array) -> jax.Array:
        """Pad a 7-dof configuration with zeros for the finger joints."""
        extra = self.chain.dof - qs.shape[-1]
        if extra > 0:
            pad = jnp.zeros(qs.shape[:-1] + (extra,), qs.dtype)
            qs = jnp.concatenate([qs, pad], axis=-1)
        return qs

    def qs_to_joints_xs(self, qs: jax.Array) -> jax.Array:
        """``[..., 7] → [..., 9, 3]`` positions of the target links (parity:
        ``robot_simulator.py:138-170``, but batch-first instead of
        link-first)."""
        return fk_positions(self.chain, self._pad_q(qs), self.target_link_indices)

    def ee_position(self, qs: jax.Array) -> jax.Array:
        return self.qs_to_joints_xs(qs)[..., -1, :]

    def ee_pose(self, qs: jax.Array):
        pos, rot = fk_poses(self.chain, self._pad_q(qs))
        i = self.target_link_indices[-1]
        return pos[..., i, :], rot[..., i, :, :]

    def jacobian(self, q: jax.Array) -> jax.Array:
        """Positional Jacobian of the end effector, ``[..., 3, 7]`` (exact, AD)."""
        f = lambda qq: self.ee_position(qq)
        return jax.vmap(jax.jacfwd(f))(q.reshape(-1, q.shape[-1])).reshape(
            q.shape[:-1] + (3, q.shape[-1])
        )

    def ee_xs_to_qs(
        self,
        xs: jax.Array,
        q_init: Optional[jax.Array] = None,
        iters: int = 100,
        lr: float = 0.5,
    ) -> jax.Array:
        """Batched damped-least-squares IK: ``[..., 3] targets → [..., 7]``.

        Replaces the reference's per-point pybullet IK loop
        (``robot_simulator.py:110-136``) with a jitted Gauss–Newton iteration
        batched over all targets at once.
        """
        xs = jnp.atleast_2d(xs)
        lower, upper = self.joint_limits()
        if q_init is None:
            q = jnp.broadcast_to(0.5 * (lower + upper), xs.shape[:-1] + (7,))
        else:
            q = jnp.broadcast_to(q_init, xs.shape[:-1] + (7,))

        def body(q, _):
            err = xs - self.ee_position(q)
            jac = self.jacobian(q)  # [..., 3, 7]
            jjt = jac @ jnp.swapaxes(jac, -1, -2) + 1e-4 * jnp.eye(3)
            dq = jnp.einsum(
                "...ij,...i->...j", jac, jnp.linalg.solve(jjt, err[..., None])[..., 0]
            )
            q = jnp.clip(q + lr * dq, lower, upper)
            return q, None

        q, _ = jax.lax.scan(body, q, None, length=iters)
        return q
