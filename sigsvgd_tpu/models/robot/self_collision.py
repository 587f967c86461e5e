"""Capsule-based exact self-collision oracle for the Panda arm.

Replaces pybullet's role as the self-collision ground truth / dataset labeler
(reference ``pybullet_collision_check.py`` +
``script_robot_generate_self_collision_dataset.py:36-47``): the arm is
approximated by a small set of capsules anchored between FK frames (trimmed so
kinematically-adjacent capsules don't overlap by construction); the checked
pairs follow the reference SRDF's enabled collision matrix
(``robot_resources/panda/config/panda.srdf``) collapsed onto the capsule
groups. Fully differentiable and jittable, so it serves as (a) the labeler
for the learned predictor, (b) an exact verifier, and (c) an analytic cost.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ...utils.math import safe_norm
from .kinematics import fk_poses
from .panda import PandaRobot


class Capsule(NamedTuple):
    """Segment between FK frames ``a → b`` trimmed to ``[ta, tb]`` with radius
    ``r``. Frame indices address ``[base, link1..link8, hand]`` positions."""

    a: int
    b: int
    ta: float
    tb: float
    r: float


# geometric capsule decomposition (frames: 0=base, 1..8=panda_link1..8, 9=hand)
PANDA_CAPSULES = (
    Capsule(0, 1, 0.0, 1.0, 0.10),  # 0: base column
    Capsule(2, 3, 0.0, 1.0, 0.08),  # 1: upper arm
    Capsule(3, 4, 0.0, 1.0, 0.075),  # 2: elbow
    Capsule(4, 5, 0.15, 0.85, 0.07),  # 3: forearm (trimmed off the joints)
    Capsule(6, 7, 0.25, 1.0, 0.06),  # 4: wrist
    Capsule(7, 8, 0.35, 1.0, 0.055),  # 5: flange
)
# hand: oriented capsule along the gripper's local y axis (width of the hand)
HAND_HALF_WIDTH = 0.09
HAND_RADIUS = 0.05

# checked pairs (capsule indices; 6 = hand) — SRDF-enabled link pairs mapped
# onto the capsule groups: base vs forearm/wrist/flange/hand, upper-arm vs
# wrist/flange/hand, elbow vs flange/hand, forearm vs hand
PANDA_CHECK_PAIRS = (
    (0, 3), (0, 4), (0, 5), (0, 6),
    (1, 4), (1, 5), (1, 6),
    (2, 5), (2, 6),
    (3, 6),
)


def segment_distance(
    p0: jax.Array, p1: jax.Array, q0: jax.Array, q1: jax.Array, eps: float = 1e-9
) -> jax.Array:
    """Minimum distance between segments ``[p0, p1]`` and ``[q0, q1]``
    (batched over leading dims; standard clamped closest-point form)."""
    d1 = p1 - p0
    d2 = q1 - q0
    r = p0 - q0
    a = jnp.sum(d1 * d1, -1)
    e = jnp.sum(d2 * d2, -1)
    f = jnp.sum(d2 * r, -1)
    c = jnp.sum(d1 * r, -1)
    b = jnp.sum(d1 * d2, -1)
    denom = a * e - b * b
    s = jnp.where(denom > eps, (b * f - c * e) / jnp.maximum(denom, eps), 0.0)
    s = jnp.clip(s, 0.0, 1.0)
    t = (b * s + f) / jnp.maximum(e, eps)
    t_cl = jnp.clip(t, 0.0, 1.0)
    # re-project s for clamped t
    s = jnp.clip((b * t_cl - c) / jnp.maximum(a, eps), 0.0, 1.0)
    closest1 = p0 + s[..., None] * d1
    closest2 = q0 + t_cl[..., None] * d2
    return safe_norm(closest1 - closest2)


def _capsule_endpoints(robot: PandaRobot, q: jax.Array):
    """All capsule endpoints + radii: returns (p0 [..., C, 3], p1, radii [C])."""
    xs = robot.qs_to_joints_xs(q)  # [..., 9, 3]
    base = jnp.zeros_like(xs[..., :1, :])
    pts = jnp.concatenate([base, xs], axis=-2)  # frames [..., 10, 3]

    p0s, p1s, radii = [], [], []
    for cap in PANDA_CAPSULES:
        a = pts[..., cap.a, :]
        b = pts[..., cap.b, :]
        p0s.append(a + cap.ta * (b - a))
        p1s.append(a + cap.tb * (b - a))
        radii.append(cap.r)

    # oriented hand capsule from the hand frame's rotation
    pos, rot = fk_poses(robot.chain, robot._pad_q(q))
    hand_idx = robot.target_link_indices[-1]
    hand_pos = pos[..., hand_idx, :]
    hand_y = rot[..., hand_idx, :, 1]
    p0s.append(hand_pos - HAND_HALF_WIDTH * hand_y)
    p1s.append(hand_pos + HAND_HALF_WIDTH * hand_y)
    radii.append(HAND_RADIUS)

    return jnp.stack(p0s, -2), jnp.stack(p1s, -2), jnp.asarray(radii, q.dtype)


def self_collision_margins(
    robot: PandaRobot,
    q: jax.Array,
    pairs: Sequence[Tuple[int, int]] = PANDA_CHECK_PAIRS,
) -> jax.Array:
    """Per-pair clearance margins ``dist - (r_i + r_j)``: ``[..., n_pairs]``.
    Negative ⇒ collision."""
    p0, p1, rr = _capsule_endpoints(robot, q)
    margins = []
    for i, j in pairs:
        d = segment_distance(
            p0[..., i, :], p1[..., i, :], p0[..., j, :], p1[..., j, :]
        )
        margins.append(d - (rr[i] + rr[j]))
    return jnp.stack(margins, axis=-1)


def self_collision(robot: PandaRobot, q: jax.Array) -> jax.Array:
    """Boolean-ish {0,1} self-collision label per configuration ``[...]``."""
    m = self_collision_margins(robot, q)
    return (jnp.min(m, axis=-1) <= 0.0).astype(jnp.float32)


def sample_self_collision_dataset(robot: PandaRobot, key: jax.Array, n: int):
    """Random configurations + exact capsule labels (replaces the 1M-config
    pybullet labeling run, ``script_robot_generate_self_collision_dataset.py``).
    """
    import numpy as np

    lower, upper = robot.joint_limits()
    qs = jax.random.uniform(key, (n, 7), minval=lower, maxval=upper)
    labels = self_collision(robot, qs)
    return np.asarray(qs), np.asarray(labels)
