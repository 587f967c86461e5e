"""Demo: Panda FK/IK round-trip + arm visualization.

Counterpart of reference ``examples/demo_panda_model.py`` /
``demo_gradient_descent_from_arm.py``. Run: ``python examples/demo_panda_model.py``.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from sigsvgd_tpu.models.robot import PandaRobot  # noqa: E402
from sigsvgd_tpu.utils.plots import plot_arm_trajectories  # noqa: E402


def main():
    robot = PandaRobot.create()
    print(f"robot: {robot.chain.name}, dof={robot.dof}")
    lo, hi = robot.joint_limits()
    print("joint limits:", np.asarray(lo).round(3), np.asarray(hi).round(3))

    q_home = jnp.asarray([0.0, -0.785, 0.0, -2.356, 0.0, 1.571, 0.785])
    xs = robot.qs_to_joints_xs(q_home)
    print("link positions @ home:\n", np.asarray(xs).round(3))
    print("end effector:", np.asarray(xs[-1]).round(4))

    # IK round-trip: perturb, solve back
    target = robot.ee_position(q_home) + jnp.asarray([0.1, -0.05, 0.05])
    q_sol = robot.ee_xs_to_qs(target[None], q_init=q_home, iters=200)[0]
    err = float(jnp.linalg.norm(robot.ee_position(q_sol) - target))
    print(f"IK position error: {err * 1000:.2f} mm")

    # batched FK of a joint-space interpolation, plotted
    qs = jnp.linspace(q_home, q_sol, 30)
    ee_traj = robot.ee_position(qs)
    plot_arm_trajectories(
        np.asarray(xs), ee_trajectories=np.asarray(ee_traj)[None],
        path="data/demo_panda.png",
    )
    print("wrote data/demo_panda.png")


if __name__ == "__main__":
    main()
