"""Natural-cubic-spline tests against scipy's fp64 implementation."""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.interpolate import CubicSpline as ScipyCubicSpline

from sigsvgd_tpu.utils import splines as sp


def test_matches_scipy_natural(rng):
    t = np.linspace(0, 1, 7)
    y = rng.standard_normal((7, 3)).astype(np.float32)
    spline = sp.natural_cubic_spline_coeffs(jnp.asarray(t), jnp.asarray(y))
    tq = np.linspace(0, 1, 41)
    got = np.asarray(sp.spline_evaluate(spline, jnp.asarray(tq)))
    ref = ScipyCubicSpline(t, y.astype(np.float64), bc_type="natural")
    np.testing.assert_allclose(got, ref(tq), rtol=1e-4, atol=1e-4)


def test_derivatives_match_scipy(rng):
    t = np.linspace(0, 1, 5)
    y = rng.standard_normal((5, 2)).astype(np.float32)
    spline = sp.natural_cubic_spline_coeffs(jnp.asarray(t), jnp.asarray(y))
    tq = np.linspace(0.05, 0.95, 11)
    ref = ScipyCubicSpline(t, y.astype(np.float64), bc_type="natural")
    d1 = np.asarray(sp.spline_derivative(spline, jnp.asarray(tq), order=1))
    d2 = np.asarray(sp.spline_derivative(spline, jnp.asarray(tq), order=2))
    np.testing.assert_allclose(d1, ref(tq, 1), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(d2, ref(tq, 2), rtol=1e-3, atol=2e-3)


def test_interpolates_knots(rng):
    y = rng.standard_normal((4, 5, 2)).astype(np.float32)  # batch of 4
    traj = np.asarray(sp.spline_trajectory(jnp.asarray(y), timesteps=9))
    # query points 0, 0.25, ... hit the knots at indices 0,2,4,6,8
    np.testing.assert_allclose(traj[:, ::2], y, rtol=1e-4, atol=1e-5)


def test_two_knots_is_linear():
    y = jnp.asarray([[0.0, 0.0], [1.0, 2.0]])
    traj = np.asarray(sp.spline_trajectory(y, timesteps=5))
    np.testing.assert_allclose(traj[:, 0], np.linspace(0, 1, 5), atol=1e-6)
    np.testing.assert_allclose(traj[:, 1], np.linspace(0, 2, 5), atol=1e-6)


@pytest.mark.slow
def test_differentiable(rng):
    import jax

    knots = jnp.asarray(rng.standard_normal((3, 2)).astype(np.float32))

    def loss(k):
        return jnp.sum(sp.spline_trajectory(k, 17) ** 2)

    g = jax.grad(loss)(knots)
    assert np.isfinite(np.asarray(g)).all()
    eps = 1e-3
    kp = knots.at[1, 0].add(eps)
    km = knots.at[1, 0].add(-eps)
    fd = (loss(kp) - loss(km)) / (2 * eps)
    np.testing.assert_allclose(float(g[1, 0]), float(fd), rtol=2e-2, atol=1e-3)
