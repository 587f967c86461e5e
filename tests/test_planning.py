"""Arm trajectory-optimization pipeline tests (small configs, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigsvgd_tpu.experiments.planning import (
    PlannerConfig,
    PlanningProblem,
    create_body_points,
    evaluate_trajectory,
    run_optimisation,
    sdf_occupancy,
)
from sigsvgd_tpu.models.robot import PandaRobot
from sigsvgd_tpu.models.robot.scene import get_scene


@pytest.fixture(scope="module")
def robot():
    return PandaRobot.create()


@pytest.fixture(scope="module")
def problem(robot):
    scene = get_scene("pillars_4")
    return PlanningProblem(
        robot=robot,
        q_start=jnp.asarray([0.0, -0.6, 0.0, -2.0, 0.0, 1.5, 0.0]),
        q_target=jnp.asarray([1.2, -0.3, 0.3, -1.5, 0.2, 1.8, 0.5]),
        occupancy_fn=sdf_occupancy(scene),
        timesteps=50,
        n_body_points=5,
    )


def test_body_points_shape():
    xs = jnp.zeros((2, 7, 9, 3))
    pts = create_body_points(xs, 10)
    assert pts.shape == (2, 7, 80, 3)


@pytest.mark.slow
def test_batch_cost_finite_and_differentiable(problem):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 3, 7)) * 0.3
    cost, aux = problem.batch_cost(x)
    assert cost.shape == (4,)
    assert np.isfinite(np.asarray(cost)).all()
    g = jax.grad(lambda xx: jnp.sum(problem.batch_cost(xx)[0]))(x)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize("method", ["sgd", "svgd", "pathsig"])
@pytest.mark.slow
def test_run_optimisation_reduces_cost(problem, method):
    key = jax.random.PRNGKey(1)
    config = PlannerConfig(
        method=method, n_iter=40, batch=6, length=5, lr=0.01,
        depth=2, timesteps=50,
    )
    lower, upper = problem.robot.joint_limits()
    x0 = jax.random.uniform(key, (6, 3, 7), minval=lower * 0.5, maxval=upper * 0.5)
    c0 = float(jnp.mean(problem.batch_cost(x0)[0]))
    xf, data = run_optimisation(problem, config, key, x0=x0)
    cf = float(jnp.mean(problem.batch_cost(xf)[0]))
    assert np.isfinite(np.asarray(xf)).all()
    assert cf < c0, f"{method}: cost {c0} -> {cf}"


@pytest.mark.slow
def test_evaluate_trajectory_metrics(problem):
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (3, 3, 7)) * 0.2
    metrics = evaluate_trajectory(problem, x)
    assert metrics["max_occ"].shape == (3,)
    assert metrics["success"].dtype == bool
    assert np.isfinite(np.asarray(metrics["ee_path_length"])).all()


@pytest.mark.slow
def test_learned_occupancy_substitutes(robot):
    """Train a tiny occupancy MLP on exact labels and plug it into the cost."""
    from sigsvgd_tpu.models.learning.mlp import train_prob_model
    from sigsvgd_tpu.models.robot.scene import sample_occupancy_dataset

    scene = get_scene("table_pick")
    pts, labels = sample_occupancy_dataset(scene, jax.random.PRNGKey(3), 5000)
    model = train_prob_model(
        jax.random.PRNGKey(4), pts, labels, features=(64, 64), epochs=10,
        batch_size=1024,
    )
    # classifies clearly-inside vs clearly-free points
    inside = float(model(jnp.asarray([[0.5, 0.0, 0.2]]))[0, 0])  # table top
    free = float(model(jnp.asarray([[-0.5, -0.8, 1.4]]))[0, 0])
    assert inside > 0.5
    assert free < 0.3

    problem = PlanningProblem(
        robot=robot,
        q_start=jnp.zeros(7),
        q_target=jnp.ones(7) * 0.3,
        occupancy_fn=lambda x: model(x)[..., 0],
        timesteps=20,
        n_body_points=4,
    )
    cost, _ = problem.batch_cost(jnp.zeros((2, 3, 7)))
    assert np.isfinite(np.asarray(cost)).all()


def test_mlp_save_load_roundtrip(tmp_path):
    from sigsvgd_tpu.models.learning.mlp import ProbModel, train_prob_model

    rng = np.random.default_rng(0)
    x = rng.standard_normal((500, 3)).astype(np.float32)
    y = (x[:, 0] > 0).astype(np.float32)
    model = train_prob_model(
        jax.random.PRNGKey(0), x, y, features=(32,), epochs=5, batch_size=128
    )
    p = tmp_path / "model.msgpack"
    model.save(p)
    model2 = ProbModel.load(p, in_dim=3, features=(32,))
    xt = jnp.asarray(x[:10])
    np.testing.assert_allclose(
        np.asarray(model(xt)), np.asarray(model2(xt)), atol=1e-6
    )


@pytest.mark.slow
def test_planning_with_lbfgs_linesearch(problem):
    """The planning pipeline runs with the L-BFGS + zoom line-search
    optimizer (VERDICT r1 item 6)."""
    import jax

    from sigsvgd_tpu.experiments.planning import PlannerConfig, run_optimisation

    cfg = PlannerConfig(
        method="svgd", n_iter=15, batch=6, optimizer="lbfgs", depth=2,
        timesteps=50,
    )
    x_final, data = run_optimisation(problem, cfg, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(x_final)).all()


@pytest.mark.slow
def test_planning_checkpoint_resume(problem, tmp_path):
    """run_optimisation resumes from its newest checkpoint."""
    import jax

    from sigsvgd_tpu.experiments.planning import PlannerConfig, run_optimisation

    cfg = PlannerConfig(method="sgd", n_iter=8, batch=4, timesteps=40)
    key = jax.random.PRNGKey(3)
    x_full, _ = run_optimisation(problem, cfg, key)

    ck = tmp_path / "plan_ck"
    cfg4 = PlannerConfig(method="sgd", n_iter=4, batch=4, timesteps=40)
    run_optimisation(problem, cfg4, key, checkpoint_dir=str(ck), checkpoint_every=4)
    assert (ck / "step_4").exists()
    x_res, _ = run_optimisation(
        problem, cfg, key, checkpoint_dir=str(ck), checkpoint_every=4
    )
    np.testing.assert_allclose(
        np.asarray(x_res), np.asarray(x_full), rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
def test_planning_lbfgs_through_host_loop_and_checkpoints(problem, tmp_path):
    """L-BFGS (extra-args zoom line search) must survive the host-loop and
    checkpointed paths: run_host_loop/step_update forward value_fn (review
    r2: optax update_fn requires value/grad/value_fn kwargs)."""
    import jax

    from sigsvgd_tpu.experiments.planning import PlannerConfig, run_optimisation

    cfg = PlannerConfig(
        method="svgd", n_iter=6, batch=4, optimizer="lbfgs", depth=2,
        timesteps=40,
    )
    # forced host loop
    x_hl, _ = run_optimisation(problem, cfg, jax.random.PRNGKey(1),
                               host_loop=True)
    assert np.isfinite(np.asarray(x_hl)).all()
    # checkpointed (host-loop segments)
    ck = tmp_path / "lbfgs_ck"
    x_ck, _ = run_optimisation(problem, cfg, jax.random.PRNGKey(1),
                               checkpoint_dir=str(ck), checkpoint_every=3)
    assert np.isfinite(np.asarray(x_ck)).all()
    # resuming an ALREADY-COMPLETE run restores and returns (no empty-
    # concatenate crash), reproducing the finished particles
    x_again, data = run_optimisation(problem, cfg, jax.random.PRNGKey(1),
                                     checkpoint_dir=str(ck),
                                     checkpoint_every=3)
    np.testing.assert_allclose(np.asarray(x_again), np.asarray(x_ck),
                               rtol=1e-6)
    assert data.loss.shape == (0,)
