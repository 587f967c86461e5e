"""Demo: replay + visualize a SAVED arm-planning result folder.

Counterpart of reference ``examples/demo_robot_visualise_saved_torch_spline.py``
(load optimized spline knots from disk, rebuild the trajectory, animate the
arm through the scene). Here the folder is one written by
``sigsvgd_tpu.experiments.robot_planning`` (``robot-<scene>/<req>-<seed>/
<method>/data.pkl``); the demo rebuilds the natural-cubic spline from the
saved knots, runs batched FK, re-audits every candidate against the exact
scene SDF, and renders the best (and optionally all) arm sweeps to a PNG.

Run: ``python examples/demo_saved_trajectory.py results/flagship_r2/robot-cage/0-42/pathsig``
(with no argument it plans a small problem first so the demo is self-contained).
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from sigsvgd_tpu.experiments.planning import create_body_points  # noqa: E402
from sigsvgd_tpu.models.robot import PandaRobot, get_scene  # noqa: E402
from sigsvgd_tpu.models.robot.scene import (  # noqa: E402
    sample_occupancy_dataset,
    scene_sdf,
)
from sigsvgd_tpu.utils.helper import load_progress  # noqa: E402
from sigsvgd_tpu.utils.plots import plot_arm_trajectories  # noqa: E402
from sigsvgd_tpu.utils.splines import spline_trajectory  # noqa: E402


def _self_contained_folder() -> Path:
    """No folder given: run a tiny planning problem and save it like the
    sweep does, so the demo always has something to replay."""
    from sigsvgd_tpu.experiments.planning import PlannerConfig
    from sigsvgd_tpu.experiments.robot_planning import run_experiment

    out = Path("data/demo_saved_trajectory")
    cfg = PlannerConfig(n_iter=60, batch=8, depth=3, timesteps=60)
    run_experiment(["cage"], ["pathsig"], n_seeds=1, out_dir=out, config=cfg,
                   n_requests=1)
    seed_dir = next((out / "robot-cage").iterdir())
    return seed_dir / "pathsig"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("folder", nargs="?", default=None,
                        help="a robot-<scene>/<req>-<seed>/<method> folder")
    parser.add_argument("--timesteps", type=int, default=100)
    parser.add_argument("--all-candidates", action="store_true",
                        help="render every particle's EE path, not just the best")
    parser.add_argument("--out", default="data/demo_saved_trajectory.png")
    args = parser.parse_args()

    folder = Path(args.folder) if args.folder else _self_contained_folder()
    scene_tag = folder.parts[-3].removeprefix("robot-")
    req_i = int(folder.parts[-2].split("-")[0])
    data = load_progress(folder)
    free_knots = jnp.asarray(data["knots"])  # [n_particles, length-2, dof]
    print(f"scene={scene_tag} request={req_i} method={folder.name} "
          f"free knots={free_knots.shape}")

    robot = PandaRobot.create()
    scene = get_scene(scene_tag)

    # the sweep saves the FREE interior knots; the endpoints come from the
    # request, which default_requests() regenerates deterministically per
    # (scene, request index)
    from sigsvgd_tpu.experiments.robot_planning import default_requests

    req = default_requests(robot, scene_tag, n=req_i + 1)[req_i]
    batch = free_knots.shape[0]
    knots = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.asarray(req.start), (batch, 1, 7)),
            free_knots,
            jnp.broadcast_to(jnp.asarray(req.target), (batch, 1, 7)),
        ],
        axis=1,
    )
    qs = spline_trajectory(knots, args.timesteps)  # [n, T, dof]
    xs = robot.qs_to_joints_xs(qs)  # [n, T, L, 3]

    # re-audit vs the exact scene SDF (ground-truth check, not the MLP)
    body = create_body_points(xs, 4)
    clearance = np.asarray(scene_sdf(scene, body).min(axis=(-1, -2)))
    n_free = int((clearance > 0.0).sum())
    best = int(np.argmax(clearance))
    print(f"collision-free candidates (exact SDF): {n_free}/{len(clearance)}; "
          f"best clearance {clearance[best]:.4f} m (particle {best})")

    pts, labels = sample_occupancy_dataset(scene, jax.random.PRNGKey(0), 8000)
    ee = np.asarray(xs[..., -1, :])
    plot_arm_trajectories(
        np.asarray(xs[best, :: max(1, args.timesteps // 12)]),
        ee_trajectories=ee if args.all_candidates else ee[best:best + 1],
        scene_points=pts[labels > 0.5],
        path=args.out,
    )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
