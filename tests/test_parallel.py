"""Sharded-SVGD tests on the virtual 8-device CPU mesh: multi-device results
must match single-device results (the identical-results check SURVEY.md §7.8
calls for)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sigsvgd_tpu.inference import SVGD, ScoreResult
from sigsvgd_tpu.kernels import GaussianKernel, SignatureKernel
from sigsvgd_tpu.parallel.mesh import make_mesh
from sigsvgd_tpu.parallel.svgd import sharded_pathsig_score, sharded_svgd_run


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert int(np.prod(list(mesh.shape.values()))) == 8


def test_sharded_svgd_matches_single_device():
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (64, 2)) + 2.0

    def score_fn(x, key):
        return ScoreResult(grad_log_p=-x)

    svgd = SVGD(kernel=GaussianKernel(), optimizer=optax.adam(0.1))
    x_single, _, _ = svgd.run(x0, score_fn, 50, key=key)

    mesh = make_mesh()
    x_sharded, losses = sharded_svgd_run(svgd, x0, score_fn, 50, mesh, key=key)
    np.testing.assert_allclose(
        np.asarray(x_single), np.asarray(x_sharded), rtol=1e-3, atol=1e-4
    )
    assert losses.shape == (50,)


def test_sharded_svgd_raw_lr_path():
    x0 = jax.random.normal(jax.random.PRNGKey(1), (16, 3)) + 1.0

    def score_fn(x, key):
        return ScoreResult(grad_log_p=-x)

    svgd = SVGD(kernel=GaussianKernel(), optimizer=None, lr=0.2)
    mesh = make_mesh()
    x_sharded, _ = sharded_svgd_run(svgd, x0, score_fn, 100, mesh)
    x_single, _, _ = svgd.run(x0, score_fn, 100)
    np.testing.assert_allclose(
        np.asarray(x_single), np.asarray(x_sharded), rtol=1e-3, atol=1e-4
    )


def test_sharded_pathsig_matches_single_device():
    """Knot-space planning score with a row-sharded signature-kernel Gram."""
    key = jax.random.PRNGKey(2)
    knots = jax.random.normal(key, (16, 4, 2)) * 0.5
    target = jnp.asarray([1.0, 1.0])

    def cost_fn(x):
        cost = jnp.sum((x[:, -1, :] - target) ** 2, axis=-1) + 0.1 * jnp.sum(
            x**2, axis=(1, 2)
        )
        return cost, {}

    kern = SignatureKernel(dyadic_order=1, bandwidth=2.0)
    svgd = SVGD(optimizer=None, lr=0.05)

    # single-device reference via the standard pathsig score
    from sigsvgd_tpu.inference.score import pathsig_score

    x_single, _, _ = svgd.run(knots, pathsig_score(cost_fn, kern), 20, key=key)

    mesh = make_mesh()
    score = sharded_pathsig_score(cost_fn, kern)
    x_sharded, _ = sharded_svgd_run(svgd, knots, score, 20, mesh, key=key)
    np.testing.assert_allclose(
        np.asarray(x_single), np.asarray(x_sharded), rtol=1e-3, atol=1e-4
    )

    # 2-D pair-grid sharding (dp=4 × sp=2) must agree too
    mesh2 = make_mesh([4, 2], ("dp", "sp"))
    score2 = sharded_pathsig_score(cost_fn, kern, col_axis="sp")
    x_2d, _ = sharded_svgd_run(
        svgd, knots, score2, 20, mesh2, key=key, col_axis="sp"
    )
    np.testing.assert_allclose(
        np.asarray(x_single), np.asarray(x_2d), rtol=1e-3, atol=1e-4
    )


def test_sharded_rbf_2d_matches_single_device():
    key = jax.random.PRNGKey(3)
    x0 = jax.random.normal(key, (32, 3)) + 1.0

    def score_fn(x, key):
        return ScoreResult(grad_log_p=-x)

    svgd = SVGD(kernel=GaussianKernel(), optimizer=optax.adam(0.1))
    x_single, _, _ = svgd.run(x0, score_fn, 30, key=key)
    mesh2 = make_mesh([4, 2], ("dp", "sp"))
    x_2d, _ = sharded_svgd_run(svgd, x0, score_fn, 30, mesh2, key=key, col_axis="sp")
    np.testing.assert_allclose(
        np.asarray(x_single), np.asarray(x_2d), rtol=1e-3, atol=1e-4
    )


@pytest.mark.slow
def test_sharded_svgd_4k_particles_scale():
    """BASELINE config-5 shape sanity: 4096 particles sharded over the
    8-device mesh, RBF kernel, runs and converges (CPU-scale workload)."""
    key = jax.random.PRNGKey(9)
    x0 = jax.random.normal(key, (4096, 8)) + 2.0

    def score_fn(x, key):
        return ScoreResult(grad_log_p=-x)

    svgd = SVGD(kernel=GaussianKernel(), optimizer=optax.adam(0.2))
    mesh = make_mesh()
    xf, losses = sharded_svgd_run(svgd, x0, score_fn, 10, mesh, key=key)
    assert np.isfinite(np.asarray(xf)).all()
    assert float(jnp.abs(jnp.mean(xf, 0)).max()) < 2.0  # moved toward 0
