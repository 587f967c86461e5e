"""Experiment-driver tests: obstacle field, ps_sgd planning, result compilers."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigsvgd_tpu.experiments import obstacle_field as of
from sigsvgd_tpu.experiments.compile_results import (
    compile_maze_results,
    compile_planning_results,
    to_markdown,
)
from sigsvgd_tpu.utils.helper import save_progress


def test_halton_low_discrepancy():
    h = of.halton(100, 2)
    assert h.shape == (100,)
    assert 0 <= h.min() and h.max() < 1
    # first base-2 Halton points
    np.testing.assert_allclose(h[:4], [0.5, 0.25, 0.75, 0.125])


def test_obstacle_field_runs_and_improves():
    res = of.run(method="sgd", n_iter=60, batch=8, lr=0.05, seed=0)
    assert np.isfinite(res["final_costs"]).all()
    assert res["paths"].shape == (8, 100, 2)
    # best path should avoid most obstacle mass relative to a straight line
    problem = of.FieldProblem(of.ObstacleField.create())
    straight = jnp.linspace(jnp.asarray(problem.start), jnp.asarray(problem.goal), 100)
    straight_cost = float(
        problem.w_obstacle * problem.field.density(straight).sum()
        + problem.w_length * 8 * np.sqrt(2)
    )
    assert res["best_cost"] < straight_cost * 1.5


def test_obstacle_field_pathsig_method():
    res = of.run(method="pathsig", n_iter=30, batch=6, lr=0.05, seed=1)
    assert np.isfinite(res["final_costs"]).all()


@pytest.mark.slow
def test_planning_ps_sgd_method(tmp_path):
    """pathsig warmup followed by SGD refinement (script_planning_robot
    method 'ps_sgd')."""
    from sigsvgd_tpu.experiments.planning import (
        PlannerConfig,
        PlanningProblem,
        run_optimisation,
        sdf_occupancy,
    )
    from sigsvgd_tpu.models.robot import PandaRobot
    from sigsvgd_tpu.models.robot.scene import get_scene

    robot = PandaRobot.create()
    problem = PlanningProblem(
        robot=robot,
        q_start=jnp.zeros(7),
        q_target=jnp.ones(7) * 0.4,
        occupancy_fn=sdf_occupancy(get_scene("empty")),
        timesteps=30,
        n_body_points=3,
    )
    cfg = PlannerConfig(method="ps_sgd", n_iter=24, batch=4, depth=2, timesteps=30,
                        lr=0.01)
    xf, (d1, d2) = run_optimisation(problem, cfg, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(xf)).all()
    assert d1.trace.shape[0] + d2.trace.shape[0] == 24 + 2  # warmup + refine


def test_compile_results_aggregation(tmp_path):
    # synthetic planning artifacts
    for method, success in (("pathsig", True), ("sgd", False)):
        save_progress(
            tmp_path / f"robot-s/0-1/{method}",
            data={
                "metrics": {
                    "success": np.asarray([success, False]),
                    "ee_path_length": np.asarray([1.5, 2.5]),
                }
            },
        )
    rows = compile_planning_results(tmp_path)
    as_md = to_markdown(rows)
    assert "pathsig" in as_md
    by_method = {r["method"]: r for r in rows}
    assert by_method["pathsig"]["success_rate"] == 1.0
    assert by_method["sgd"]["success_rate"] == 0.0
    assert by_method["pathsig"]["mean_best_ee_length"] == 1.5

    # maze artifacts
    save_progress(
        tmp_path / "maze/seed1/svmpc",
        data={"steps": 100, "costs": np.ones(100), "reached_goal": True},
    )
    mrows = compile_maze_results(tmp_path / "maze")
    assert mrows[0]["goal_rate"] == 1.0


@pytest.mark.slow
def test_maze_checkpoint_resume(tmp_path):
    """An interrupted maze episode resumes from its newest checkpoint and
    reproduces the uninterrupted run (VERDICT r1 item 8)."""
    import numpy as np

    from sigsvgd_tpu.experiments.maze import MazeConfig, run_episode

    full = run_episode(MazeConfig(kernel="rbf", steps=6), seed=7)

    ckdir = tmp_path / "ck"
    # "interrupted" run: checkpoint every 2 steps, stop after 4
    partial = run_episode(
        MazeConfig(kernel="rbf", steps=4, checkpoint_dir=str(ckdir),
                   checkpoint_every=2),
        seed=7,
    )
    assert (ckdir / "step_4").exists()
    # resumed run continues from step 4 to 6
    resumed = run_episode(
        MazeConfig(kernel="rbf", steps=6, checkpoint_dir=str(ckdir),
                   checkpoint_every=2),
        seed=7,
    )
    assert resumed["trajectory"].shape == full["trajectory"].shape
    np.testing.assert_allclose(
        resumed["trajectory"], full["trajectory"], rtol=1e-4, atol=1e-5
    )


def test_maze_live_plot_streams(tmp_path):
    """A maze episode with live_plot set streams a cost-curve PNG."""
    from sigsvgd_tpu.experiments.maze import MazeConfig, run_episode

    png = tmp_path / "live.png"
    run_episode(
        MazeConfig(kernel="rbf", steps=3, live_plot=str(png)), seed=3
    )
    assert png.exists() and png.stat().st_size > 0


@pytest.mark.slow
def test_maze_sharded_mpf_matches_single_device():
    """--mpf-mesh-devices wires parallel.mpf.sharded_mpf_observe into the
    maze loop; episodes with and without the mesh must agree (the sharded
    observe-update replicates the single-device math to fp tolerance)."""
    from sigsvgd_tpu.experiments.maze import MazeConfig, run_episode

    common = dict(kernel="rbf_fixed_bw", steps=4, use_mpf=True,
                  mpf_n_particles=16, mpf_steps=5, warm_up=0)
    single = run_episode(MazeConfig(**common), seed=11)
    sharded = run_episode(MazeConfig(**common, mpf_mesh_devices=2), seed=11)
    assert sharded["dyn_particles"] is not None
    np.testing.assert_allclose(
        sharded["trajectory"], single["trajectory"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        sharded["dyn_particles"], single["dyn_particles"],
        rtol=1e-3, atol=1e-5,
    )
