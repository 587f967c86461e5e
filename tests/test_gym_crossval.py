"""External-simulator cross-validation against gymnasium (SURVEY §2.1
'Experiment loops' / reference ``run_gym_simulation``).

Two levels: (1) step-for-step dynamics parity of our models against
gymnasium's classic-control physics on random state/action pairs; (2) a
closed-loop DuSt swing-up where gymnasium Pendulum-v1 — NOT our model — is
the environment, so controller-model mismatch would show up as failure to
pump energy into the pendulum.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

gym = pytest.importorskip("gymnasium")


def test_pendulum_step_matches_gymnasium():
    from sigsvgd_tpu.experiments.gym_sim import gym_pendulum_model

    env = gym.make("Pendulum-v1")
    env.reset(seed=0)
    model = gym_pendulum_model(dt=0.05)
    rng = np.random.default_rng(0)
    for _ in range(25):
        th = rng.uniform(-np.pi, np.pi)
        thd = rng.uniform(-7, 7)
        u = rng.uniform(-3, 3)
        env.unwrapped.state = np.array([th, thd])
        env.step(np.array([u], np.float32))
        want = env.unwrapped.state
        got = np.asarray(
            model.step(jnp.asarray([[th, thd]], jnp.float32),
                       jnp.asarray([[u]], jnp.float32))
        )[0]
        np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-5,
                                   atol=1e-5)
    env.close()


def test_cartpole_step_matches_gymnasium():
    """Our cartpole with the CORRECTED total mass (m_c + m_p) and zero
    friction reproduces gymnasium CartPole-v1's physics exactly — evidence
    the reference's ``m_c + m_c`` (cartpole.py:162) is the outlier."""
    from sigsvgd_tpu.models.cartpole import CartPoleModel

    env = gym.make("CartPole-v1")
    env.reset(seed=0)
    model = CartPoleModel(
        dt=0.02, g=9.8, mass_cart=1.0, mass_pole=0.1, length=0.5,
        mu_c=0.0, mu_p=0.0, f_mag=10.0, reference_mass_bug=False,
    )
    rng = np.random.default_rng(1)
    for _ in range(25):
        s = rng.uniform([-1, -1, -0.2, -1], [1, 1, 0.2, 1]).astype(np.float32)
        a = rng.integers(0, 2)
        env.unwrapped.state = s.astype(np.float64)
        env.step(int(a))
        want = np.asarray(env.unwrapped.state, np.float32)
        # gym's binary action {0,1} → force ∓10 = our continuous u = ±1
        u = 1.0 if a == 1 else -1.0
        got = np.asarray(
            model.step(jnp.asarray(s)[None], jnp.asarray([[u]], jnp.float32))
        )[0]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    env.close()


def test_closed_loop_dust_on_gym_pendulum():
    """DuSt plans with OUR model; gymnasium integrates the true dynamics.
    The swing-up must pump energy: the best upright angle reached over the
    episode gets well above the hanging state."""
    import optax

    from sigsvgd_tpu.controllers import DuSt
    from sigsvgd_tpu.experiments.gym_sim import gym_pendulum_model, run_gym_pendulum

    model = gym_pendulum_model()
    ctrl = DuSt(
        model=model,
        hz_len=20,
        n_pol=16,
        kernel_mode="policy",
        optimizer=optax.adam(0.3),
        inst_cost_fn=model.swingup_inst_cost,
        term_cost_fn=model.swingup_term_cost,
    )
    cstate = ctrl.init(jax.random.PRNGKey(0))
    out = run_gym_pendulum(ctrl, cstate, n_steps=100, seed=0, opt_steps=3)
    thetas = out["states"][:, 0]
    # wrapped distance from upright; hanging start = π
    upright_err = np.abs((thetas + np.pi) % (2 * np.pi) - np.pi)
    assert upright_err.min() < 0.1, f"never reached upright: {upright_err.min()}"
    # and STAYS up: the controller stabilizes the true (gym) pendulum
    assert upright_err[-10:].max() < 0.5, upright_err[-10:]
