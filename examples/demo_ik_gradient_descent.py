"""Demo: Panda IK + raw gradient descent from an arm configuration.

Counterparts of the reference's ``demo_robot_visualise_*`` /
``demo_gradient_descent_from_arm.py`` examples: (1) damped-least-squares IK
to a Cartesian target and round-trip check through FK; (2) plain gradient
descent of a scene-collision + reach cost directly in joint space, rendered
as an arm-trajectory figure (``utils.plots.plot_arm_trajectories``).

Run: ``python examples/demo_ik_gradient_descent.py [--out /tmp/demo_ik]``
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

# visualization demo: CPU, like its siblings (the container pins the TPU
# platform at interpreter start; demos must not contend for the chip)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=Path, default=Path("/tmp/demo_ik"))
    parser.add_argument("--steps", type=int, default=150)
    args = parser.parse_args()
    args.out.mkdir(parents=True, exist_ok=True)

    from sigsvgd_tpu.experiments.planning import create_body_points, sdf_occupancy
    from sigsvgd_tpu.models.robot import PandaRobot, get_scene
    from sigsvgd_tpu.utils.plots import plot_arm_trajectories

    robot = PandaRobot.create()

    # -- 1. IK: reach a Cartesian point, verify by FK round-trip ------------
    target_xyz = jnp.asarray([0.45, 0.25, 0.55])
    q0 = jnp.zeros((1, robot.dof)).at[0, 3].set(-1.5).at[0, 5].set(1.5)
    q_ik = robot.ee_xs_to_qs(target_xyz[None], q0)
    ee = robot.ee_position(q_ik)
    err = float(jnp.linalg.norm(ee[0] - target_xyz))
    print(f"IK: target {np.asarray(target_xyz)} reached with {err * 1000:.2f} mm error")

    # -- 2. gradient descent from the arm through a cluttered scene --------
    scene = get_scene("table_bars")
    occ = sdf_occupancy(scene)

    def cost(q):
        xs = robot.qs_to_joints_xs(q)
        body = create_body_points(xs, 6)
        collision = occ(body).mean()
        reach = jnp.sum((xs[..., -1, :] - target_xyz) ** 2)
        return 4.0 * collision + reach

    grad = jax.jit(jax.grad(cost))
    q = q0
    path = [np.asarray(q[0])]
    for i in range(args.steps):
        q = q - 0.1 * grad(q)
        if (i + 1) % 10 == 0:
            path.append(np.asarray(q[0]))
    final_cost = float(cost(q))
    print(f"gradient descent: cost {float(cost(q0)):.3f} -> {final_cost:.3f}")

    qs = jnp.asarray(np.stack(path))
    links = np.asarray(robot.qs_to_joints_xs(qs))  # [n_arms, L, 3]
    ee = np.asarray(robot.ee_position(qs))[None]  # [1, T, 3]
    from sigsvgd_tpu.models.robot.scene import sample_occupancy_dataset

    pts, labels = sample_occupancy_dataset(
        scene, jax.random.PRNGKey(0), 4000, margin=0.0
    )
    occupied = np.asarray(pts)[np.asarray(labels) > 0.5]
    plot_arm_trajectories(
        links, ee_trajectories=ee, scene_points=occupied,
        path=args.out / "gradient_descent_arm.png",
    )
    print(f"wrote {args.out / 'gradient_descent_arm.png'}")


if __name__ == "__main__":
    main()
