"""SVGD convergence tests on analytic targets (reference test_svgd.py analog,
but with numeric moment-matching assertions instead of eyeballing movies)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from sigsvgd_tpu.inference import SVGD, ScaledSVGD, ScoreResult
from sigsvgd_tpu.kernels import GaussianKernel, IMQKernel, ScaledGaussianKernel
from sigsvgd_tpu.models import DoubleBanana, star_gaussian


def _gauss_mixture_score(x):
    """2-component 1D-ish GMM in 2D: modes at (-2, 0) and (2, 0)."""
    mus = jnp.asarray([[-2.0, 0.0], [2.0, 0.0]])

    def logp(xx):
        d = xx[:, None, :] - mus[None]
        comp = -0.5 * jnp.sum(d * d, -1)
        return jax.nn.logsumexp(comp, axis=-1)

    return logp


def test_svgd_matches_gaussian_moments():
    """Particles driven by a standard-normal score should match N(0, I)."""
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (200, 2)) * 0.1 + 3.0

    def score_fn(x, key):
        return ScoreResult(grad_log_p=-x)

    svgd = SVGD(kernel=GaussianKernel(), optimizer=optax.adam(0.1))
    xf, _, _ = jax.jit(lambda x: svgd.run(x, score_fn, 500))(x0)
    mean = np.asarray(jnp.mean(xf, 0))
    cov = np.cov(np.asarray(xf).T)
    np.testing.assert_allclose(mean, 0.0, atol=0.15)
    np.testing.assert_allclose(cov, np.eye(2), atol=0.25)


def test_svgd_covers_both_mixture_modes():
    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (100, 2)) * 0.5  # start between the modes
    logp = _gauss_mixture_score(None)

    def score_fn(x, key):
        return ScoreResult(grad_log_p=jax.grad(lambda xx: jnp.sum(logp(xx)))(x))

    svgd = SVGD(kernel=GaussianKernel(), optimizer=optax.adam(0.1))
    xf, _, _ = jax.jit(lambda x: svgd.run(x, score_fn, 400))(x0)
    left = np.sum(np.asarray(xf[:, 0]) < 0)
    assert 20 < left < 80, f"mode collapse: {left}/100 in left mode"


def test_svgd_double_banana_improves_logp():
    target = DoubleBanana()
    key = jax.random.PRNGKey(2)
    x0 = jax.random.normal(key, (50, 2)) * 1.5

    def score_fn(x, key):
        return ScoreResult(grad_log_p=target.grad_log_p(x), loss=-target.logp(x))

    svgd = SVGD(kernel=GaussianKernel(), optimizer=optax.adam(0.05))
    xf, _, data = jax.jit(lambda x: svgd.run(x, score_fn, 300))(x0)
    assert float(jnp.mean(target.logp(xf))) > float(jnp.mean(target.logp(x0))) + 10
    assert data.trace.shape == (301, 50, 2)


def test_scaled_svgd_star_gaussian():
    target = star_gaussian(skewness=10.0, n_components=5)
    key = jax.random.PRNGKey(3)
    x0 = jax.random.normal(key, (60, 2)) * 0.3

    def score_fn(x, key):
        return ScoreResult(grad_log_p=target.grad_log_p(x), loss=-target.logp(x))

    svgd = ScaledSVGD(
        kernel=ScaledGaussianKernel(), optimizer=optax.adam(0.05), precondition=True
    )
    xf, _, _ = jax.jit(lambda x: svgd.run(x, score_fn, 300))(x0)
    # particles migrate outward onto the star arms (component means at r=1.5)
    radii = jnp.linalg.norm(xf, axis=-1)
    assert 1.0 < float(jnp.mean(radii)) < 2.2
    assert np.isfinite(np.asarray(xf)).all()


def test_raw_lr_and_adagrad_paths():
    def score_fn(x, key):
        return ScoreResult(grad_log_p=-x)

    x0 = jax.random.normal(jax.random.PRNGKey(4), (30, 2)) + 2.0
    for svgd in (
        SVGD(kernel=GaussianKernel(), optimizer=None, lr=0.1),
        SVGD(kernel=GaussianKernel(), optimizer=None, lr=0.5, adagrad=True),
        SVGD(kernel=IMQKernel(), optimizer=None, lr=0.1),
    ):
        xf, _, _ = jax.jit(lambda x, s=svgd: s.run(x, score_fn, 200))(x0)
        assert float(jnp.abs(jnp.mean(xf, 0)).max()) < 0.8


def test_opt_state_warm_start_round_trips():
    def score_fn(x, key):
        return ScoreResult(grad_log_p=-x)

    svgd = SVGD(kernel=GaussianKernel(), optimizer=optax.adam(0.1))
    x0 = jax.random.normal(jax.random.PRNGKey(5), (10, 2))
    x1, st1, _ = svgd.run(x0, score_fn, 5)
    x2, st2, _ = svgd.run(x1, score_fn, 5, state=st1)
    assert int(st2.step) == 10


def test_gradient_mask_freezes_particles():
    mask = jnp.ones((10, 2)).at[:3].set(0.0)

    def score_fn(x, key):
        return ScoreResult(grad_log_p=-x)

    svgd = SVGD(kernel=GaussianKernel(), optimizer=None, lr=0.2, gradient_mask=mask)
    x0 = jax.random.normal(jax.random.PRNGKey(6), (10, 2)) + 1.0
    xf, _, _ = svgd.run(x0, score_fn, 50)
    np.testing.assert_allclose(np.asarray(xf[:3]), np.asarray(x0[:3]), atol=1e-6)
    assert float(jnp.abs(xf[3:]).mean()) < float(jnp.abs(x0[3:]).mean())


def test_log_prior_keeps_particles_in_box():
    from sigsvgd_tpu.utils.math import smoothed_box_log_prob

    def score_fn(x, key):
        return ScoreResult(grad_log_p=jnp.ones_like(x) * 5.0)  # push right hard

    def log_prior(x):
        return smoothed_box_log_prob(x, -1.0, 1.0, 0.1)

    svgd = SVGD(kernel=GaussianKernel(), optimizer=None, lr=0.005, log_prior=log_prior)
    x0 = jax.random.normal(jax.random.PRNGKey(7), (20, 2)) * 0.1
    xf, _, _ = svgd.run(x0, score_fn, 200)
    assert float(jnp.max(xf)) < 1.5  # prior holds particles near the box


def test_sine_density_svgd():
    from sigsvgd_tpu.models import Sine

    target = Sine(prior_var=1.0, y_var=0.3)
    x0 = jax.random.normal(jax.random.PRNGKey(8), (80, 2)) * 0.3

    def score_fn(x, key):
        return ScoreResult(grad_log_p=target.grad_log_p(x))

    svgd = SVGD(kernel=GaussianKernel(), optimizer=optax.adam(0.05))
    xf, _, _ = jax.jit(lambda x: svgd.run(x, score_fn, 200))(x0)
    # particles settle near the x2 = -sin(x1) manifold
    resid = jnp.abs(xf[:, 1] + jnp.sin(xf[:, 0]))
    assert float(jnp.mean(resid)) < 0.5
    assert np.isfinite(np.asarray(xf)).all()
