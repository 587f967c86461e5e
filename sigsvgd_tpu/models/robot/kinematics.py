"""Batched differentiable forward kinematics from a :class:`KinematicChain`.

TPU mapping: the joint tree is unrolled at trace time (static topology, ~10
joints for the Panda) into a chain of fused ``[..., 4]``-wide rotation
composes; batching over configurations is pure vectorization (``vmap``-free
broadcasting), so FK over ``batch × timesteps`` trajectories is one XLA
program dominated by elementwise ops — exactly what the VPU wants. Exact
Jacobians come from JAX AD (the reference leans on
``differentiable-robot-model``'s torch autograd, ``robot_simulator.py:138-170``).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .urdf import JOINT_PRISMATIC, JOINT_REVOLUTE, KinematicChain


def _axis_rotation(axis: np.ndarray, q: jax.Array) -> jax.Array:
    """Rodrigues rotation about a fixed unit axis; ``q [...]`` → ``[..., 3, 3]``."""
    kx, ky, kz = (float(a) for a in axis)
    k_cross = jnp.asarray(
        [[0.0, -kz, ky], [kz, 0.0, -kx], [-ky, kx, 0.0]], dtype=q.dtype
    )
    k_outer = jnp.asarray(
        np.outer(axis, axis).astype(np.float32), dtype=q.dtype
    )
    c = jnp.cos(q)[..., None, None]
    s = jnp.sin(q)[..., None, None]
    eye = jnp.eye(3, dtype=q.dtype)
    return c * eye + s * k_cross + (1.0 - c) * k_outer


def fk_poses(
    chain: KinematicChain, q: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """All-link poses for configurations ``q [..., dof]``.

    Returns ``(positions [..., J, 3], rotations [..., J, 3, 3])`` in joint
    (topological) order — index with ``chain.link_index(name)``.
    """
    batch = q.shape[:-1]
    dtype = q.dtype
    rots = []
    poss = []
    for j in range(chain.n_joints):
        origin = jnp.asarray(chain.origins[j], dtype=dtype)
        o_rot = jnp.broadcast_to(origin[:3, :3], batch + (3, 3))
        o_pos = jnp.broadcast_to(origin[:3, 3], batch + (3,))
        p = chain.parent_joint[j]
        if p < 0:
            parent_rot = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3))
            parent_pos = jnp.zeros(batch + (3,), dtype)
        else:
            parent_rot, parent_pos = rots[p], poss[p]

        # parent → joint frame
        rot = parent_rot @ o_rot
        pos = parent_pos + jnp.einsum("...ij,...j->...i", parent_rot, o_pos)

        jtype = int(chain.joint_types[j])
        if jtype == JOINT_REVOLUTE:
            qj = q[..., chain.q_index[j]]
            rot = rot @ _axis_rotation(chain.axes[j], qj)
        elif jtype == JOINT_PRISMATIC:
            qj = q[..., chain.q_index[j]]
            axis = jnp.asarray(chain.axes[j], dtype=dtype)
            pos = pos + qj[..., None] * jnp.einsum("...ij,j->...i", rot, axis)
        rots.append(rot)
        poss.append(pos)
    return jnp.stack(poss, axis=-2), jnp.stack(rots, axis=-3)


def fk_positions(
    chain: KinematicChain, q: jax.Array, link_indices: Tuple[int, ...]
) -> jax.Array:
    """Positions of selected links: ``q [..., dof] → [..., n_links, 3]``."""
    pos, _ = fk_poses(chain, q)
    return pos[..., jnp.asarray(link_indices), :]
