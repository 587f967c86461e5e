"""Planar 3-link arm (BASELINE config 3): URDF generality + planning.

A synthesized 3-revolute-joint planar arm URDF exercises the parser/FK on a
robot that is *not* the Panda, with a closed-form FK oracle, and runs the
signature-kernel planner on it.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigsvgd_tpu.models.robot.kinematics import fk_positions
from sigsvgd_tpu.models.robot.urdf import parse_urdf

PLANAR_URDF = """<?xml version="1.0"?>
<robot name="planar3">
  <link name="base"/>
  <link name="l1"/><link name="l2"/><link name="l3"/><link name="ee"/>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="l1"/>
    <origin xyz="0 0 0" rpy="0 0 0"/><axis xyz="0 0 1"/>
    <limit lower="-3.14" upper="3.14"/>
  </joint>
  <joint name="j2" type="revolute">
    <parent link="l1"/><child link="l2"/>
    <origin xyz="1.0 0 0" rpy="0 0 0"/><axis xyz="0 0 1"/>
    <limit lower="-3.14" upper="3.14"/>
  </joint>
  <joint name="j3" type="revolute">
    <parent link="l2"/><child link="l3"/>
    <origin xyz="0.8 0 0" rpy="0 0 0"/><axis xyz="0 0 1"/>
    <limit lower="-3.14" upper="3.14"/>
  </joint>
  <joint name="jee" type="fixed">
    <parent link="l3"/><child link="ee"/>
    <origin xyz="0.6 0 0" rpy="0 0 0"/>
  </joint>
</robot>
"""

L = (1.0, 0.8, 0.6)


@pytest.fixture(scope="module")
def chain(tmp_path_factory):
    p = tmp_path_factory.mktemp("urdf") / "planar3.urdf"
    p.write_text(PLANAR_URDF)
    return parse_urdf(p)


def _fk_oracle(q):
    """Closed-form planar FK: cumulative angles, link tips."""
    a1, a12, a123 = q[0], q[0] + q[1], q[0] + q[1] + q[2]
    p1 = np.array([L[0] * np.cos(a1), L[0] * np.sin(a1), 0.0])
    p2 = p1 + np.array([L[1] * np.cos(a12), L[1] * np.sin(a12), 0.0])
    p3 = p2 + np.array([L[2] * np.cos(a123), L[2] * np.sin(a123), 0.0])
    return p1, p2, p3


def test_parse(chain):
    assert chain.dof == 3
    assert chain.actuated_names == ("j1", "j2", "j3")
    np.testing.assert_allclose(chain.lower, [-3.14] * 3)


def test_fk_matches_closed_form(chain, rng):
    ee_idx = (chain.link_index("l2"), chain.link_index("l3"), chain.link_index("ee"))
    for _ in range(5):
        q = rng.uniform(-3, 3, size=3).astype(np.float32)
        xs = np.asarray(fk_positions(chain, jnp.asarray(q), ee_idx))
        p1, p2, p3 = _fk_oracle(q.astype(np.float64))
        np.testing.assert_allclose(xs[0], p1, atol=1e-5)
        np.testing.assert_allclose(xs[1], p2, atol=1e-5)
        np.testing.assert_allclose(xs[2], p3, atol=1e-5)


@pytest.mark.slow
def test_planar_arm_pathsig_planning(chain):
    """Knot-space signature-kernel planning for the planar arm around a
    circular obstacle in the plane."""
    from sigsvgd_tpu.inference import SVGD
    from sigsvgd_tpu.inference.score import pathsig_score
    from sigsvgd_tpu.kernels import SignatureKernel
    from sigsvgd_tpu.utils.math import safe_norm
    from sigsvgd_tpu.utils.splines import spline_trajectory

    link_idx = (chain.link_index("l2"), chain.link_index("l3"), chain.link_index("ee"))
    q_start = jnp.asarray([2.6, 0.3, 0.2])
    q_goal = jnp.asarray([0.4, -0.3, -0.2])
    obstacle = jnp.asarray([0.0, 1.6, 0.0])  # circle the arm must avoid
    radius = 0.35

    def cost_fn(x):
        batch = x.shape[0]
        knots = jnp.concatenate(
            [
                jnp.broadcast_to(q_start, (batch, 1, 3)),
                x,
                jnp.broadcast_to(q_goal, (batch, 1, 3)),
            ],
            axis=1,
        )
        qs = spline_trajectory(knots, 40)  # [batch, T, 3]
        xs = fk_positions(chain, qs, link_idx)  # [batch, T, 3links, 3]
        dist = safe_norm(xs - obstacle)  # [batch, T, 3]
        penetration = jnp.maximum(radius + 0.05 - dist, 0.0).sum((1, 2))
        length = safe_norm(qs[:, 1:] - qs[:, :-1]).sum(-1)
        return 50.0 * penetration + length, {}

    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (8, 3, 3), minval=-2.5, maxval=2.5)
    svgd = SVGD(optimizer=None, lr=0.02)
    score = pathsig_score(cost_fn, SignatureKernel(dyadic_order=2, bandwidth=2.0))
    xf, _, _ = jax.jit(lambda x: svgd.run(x, score, 80, key=key))(x0)
    c0 = float(jnp.mean(cost_fn(x0)[0]))
    cf = float(jnp.mean(cost_fn(xf)[0]))
    assert np.isfinite(np.asarray(xf)).all()
    assert cf < c0
