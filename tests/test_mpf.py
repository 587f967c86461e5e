"""MPF (Stein particle filter) tests: online dynamics-parameter inference."""
import jax
import jax.numpy as jnp
import numpy as np

from sigsvgd_tpu.inference import MPF, GaussianLikelihood
from sigsvgd_tpu.kernels import GaussianKernel
from sigsvgd_tpu.models import ParticleModel

TRUE_MASS = 2.0


def _setup(log_space=False):
    model = ParticleModel.create(
        dt=0.1, mass=TRUE_MASS, control_type="acceleration",
        map_size=(10, 10), map_cell_size=0.5, max_speed=50.0,
    )
    lik = GaussianLikelihood(
        step_fn=model.step,
        params_to_dict=model.params_to_dict,
        obs_std=0.05,
        log_space=log_space,
    )
    mpf = MPF(likelihood=lik, kernel=GaussianKernel(), lr=0.05, bw=0.3)
    return model, mpf


def test_mpf_converges_to_true_mass():
    model, mpf = _setup()
    key = jax.random.PRNGKey(0)
    # prior particles well away from the truth
    particles = 1.0 + 0.2 * jax.random.normal(key, (40, 1))
    state = jnp.asarray([0.0, 0.0, 0.0, 0.0])
    mstate = mpf.init(particles, state)

    observe = jax.jit(lambda st, a, obs: mpf.observe(st, a, obs, n_steps=20))
    keys = jax.random.split(key, 30)
    for i in range(30):
        action = jax.random.uniform(keys[i], (2,), minval=-3.0, maxval=3.0)
        next_state = model.step(state[None], action[None])[0]  # true dynamics
        mstate, grads = observe(mstate, action, next_state)
        state = next_state

    est = float(jnp.mean(mstate.particles))
    assert abs(est - TRUE_MASS) < 0.3, f"MPF estimate {est} vs true {TRUE_MASS}"
    assert np.isfinite(np.asarray(grads)).all()


def test_mpf_log_space_path():
    model, mpf = _setup(log_space=True)
    key = jax.random.PRNGKey(1)
    particles = jnp.log(1.0 + 0.2 * jax.random.uniform(key, (30, 1)))
    state = jnp.asarray([0.0, 0.0, 0.0, 0.0])
    mstate = mpf.init(particles, state)
    observe = jax.jit(lambda st, a, obs: mpf.observe(st, a, obs, n_steps=15))
    keys = jax.random.split(key, 25)
    for i in range(25):
        action = jax.random.uniform(keys[i], (2,), minval=-3.0, maxval=3.0)
        next_state = model.step(state[None], action[None])[0]
        mstate, _ = observe(mstate, action, next_state)
        state = next_state
    est = float(jnp.exp(mstate.particles.mean()))  # geometric mean
    assert abs(est - TRUE_MASS) < 0.5, f"log-space MPF estimate {est}"


def test_mpf_prior_updates_after_observe():
    _, mpf = _setup()
    key = jax.random.PRNGKey(2)
    particles = jax.random.normal(key, (10, 1)) + 1.5
    state = jnp.zeros((4,))
    mstate = mpf.init(particles, state)
    np.testing.assert_allclose(
        np.asarray(mstate.prior_means), np.asarray(particles)
    )
    mstate2, _ = mpf.observe(mstate, jnp.ones(2), state, n_steps=3)
    # prior rebuilt around moved particles
    np.testing.assert_allclose(
        np.asarray(mstate2.prior_means), np.asarray(mstate2.particles)
    )
    assert not np.allclose(
        np.asarray(mstate2.particles), np.asarray(particles)
    )
