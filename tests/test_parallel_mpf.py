"""Sharded MPF observe-update must match the single-device filter."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigsvgd_tpu.inference import MPF, GaussianLikelihood
from sigsvgd_tpu.kernels import GaussianKernel
from sigsvgd_tpu.models import ParticleModel
from sigsvgd_tpu.parallel import make_mesh, sharded_mpf_observe

TRUE_MASS = 2.0


def _setup(bw=0.3):
    model = ParticleModel.create(
        dt=0.1, mass=TRUE_MASS, control_type="acceleration",
        map_size=(10, 10), map_cell_size=0.5, max_speed=50.0,
    )
    lik = GaussianLikelihood(
        step_fn=model.step,
        params_to_dict=model.params_to_dict,
        obs_std=0.05,
    )
    return model, MPF(likelihood=lik, kernel=GaussianKernel(), lr=0.05, bw=bw)


@pytest.mark.parametrize("bw", [0.3, None])
def test_sharded_mpf_matches_single_device(bw):
    """One observe-update, fixed and Silverman bandwidths."""
    model, mpf = _setup(bw=bw)
    key = jax.random.PRNGKey(0)
    particles = 1.0 + 0.2 * jax.random.normal(key, (40, 1))
    state = jnp.asarray([0.0, 0.0, 0.0, 0.0])
    mstate = mpf.init(particles, state)

    action = jnp.asarray([1.0, -0.5])
    next_state = model.step(state[None], action[None])[0]

    single, grads_s = mpf.observe(mstate, action, next_state, n_steps=10)
    mesh = make_mesh()
    shard, grads_p = sharded_mpf_observe(
        mpf, mstate, action, next_state, mesh, n_steps=10
    )
    np.testing.assert_allclose(
        np.asarray(shard.particles), np.asarray(single.particles),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(grads_p), np.asarray(grads_s), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(shard.prior_bw), np.asarray(single.prior_bw), rtol=1e-6
    )


@pytest.mark.slow
def test_sharded_mpf_converges_closed_loop():
    """30 real transitions through the sharded filter recover the true mass
    (the single-device convergence test, sharded)."""
    model, mpf = _setup()
    key = jax.random.PRNGKey(0)
    particles = 1.0 + 0.2 * jax.random.normal(key, (40, 1))
    state = jnp.asarray([0.0, 0.0, 0.0, 0.0])
    mstate = mpf.init(particles, state)
    mesh = make_mesh()

    observe = jax.jit(
        lambda st, a, obs: sharded_mpf_observe(
            mpf, st, a, obs, mesh, n_steps=20
        )
    )
    keys = jax.random.split(key, 30)
    for i in range(30):
        action = jax.random.uniform(keys[i], (2,), minval=-3.0, maxval=3.0)
        next_state = model.step(state[None], action[None])[0]
        mstate, grads = observe(mstate, action, next_state)
        state = next_state

    est = float(jnp.mean(mstate.particles))
    assert abs(est - TRUE_MASS) < 0.3, f"sharded MPF estimate {est}"
    assert np.isfinite(np.asarray(grads)).all()
