"""Closed-loop controller tests: DISCO and DuSt solve small control problems."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sigsvgd_tpu.controllers import DISCO, DuSt
from sigsvgd_tpu.kernels import ScaledGaussianKernel, SignatureKernel
from sigsvgd_tpu.models import ParticleModel, PendulumModel
from sigsvgd_tpu.utils import distributions as du
from sigsvgd_tpu.utils.utf import MerweScaledUTF


def _point_mass():
    return ParticleModel.create(
        dt=0.1,
        control_type="acceleration",
        max_speed=5.0,
        map_size=(8, 8),
        map_cell_size=0.1,
        init_state=(-2.0, -2.0, 0.0, 0.0),
        target_state=(0.0, 0.0, 0.0, 0.0),
        cost_params={"w_qpos": 2.0, "w_qvel": 0.2, "w_ctrl": 0.01, "w_qpos_T": 10.0,
                     "w_qvel_T": 0.5, "w_obs": 0.0},
    )


def test_disco_drives_point_mass_to_goal():
    model = _point_mass()
    ctrl = DISCO(
        model=model,
        hz_len=15,
        n_actions=128,
        pol_cov=tuple(map(tuple, (np.eye(2) * 4.0).tolist())),
        temperature=0.5,
        ctrl_penalty=0.99,
        inst_cost_fn=model.default_inst_cost,
        term_cost_fn=model.default_term_cost,
    )
    cstate = ctrl.init()
    state = jnp.asarray(model.init_state)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def mpc_step(state, cstate, key):
        key, sub = jax.random.split(key)
        cstate, _ = ctrl.forward(state, cstate, None, sub)
        action, cstate = ctrl.act(cstate)
        nxt = model.step(state[None], action)[0]
        return nxt, cstate, key

    for _ in range(60):
        state, cstate, key = mpc_step(state, cstate, key)
    dist = float(jnp.linalg.norm(state[:2]))
    assert dist < 0.5, f"DISCO did not reach goal, dist={dist}"


@pytest.mark.parametrize("n_pol", [1, 3])
def test_disco_param_sampling_and_utf_paths(n_pol):
    """MC-parameter and sigma-point rollouts, single policy and ensemble
    (the reference's multi-policy a_mat path, ``disco.py:213-216``)."""
    model = PendulumModel(dt=0.05)
    dist = du.Gaussian(
        mean=jnp.asarray([9.8, 1.0, 1.0]), cov=jnp.eye(3) * 0.01
    )
    for kwargs in (
        dict(n_params=4),
        dict(utf=MerweScaledUTF(n=3)),
    ):
        ctrl = DISCO(
            model=model,
            hz_len=10,
            n_actions=32,
            n_pol=n_pol,
            temperature=1.0,
            inst_cost_fn=model.swingup_inst_cost,
            term_cost_fn=model.swingup_term_cost,
            **kwargs,
        )
        cstate = ctrl.init()
        state = jnp.asarray([jnp.pi, 0.0])
        cstate, data = jax.jit(ctrl.forward)(state, cstate, dist, jax.random.PRNGKey(1))
        assert data.costs.shape == (32, n_pol)
        assert np.isfinite(np.asarray(data.costs)).all()
        assert np.isfinite(np.asarray(cstate.a_seq)).all()
        np.testing.assert_allclose(float(cstate.a_mix.sum()), 1.0, atol=1e-5)


def test_dust_point_mass_autograd_path():
    """DuSt with autodiff likelihood gradients (n_action_samples=0)."""
    model = _point_mass()
    ctrl = DuSt(
        model=model,
        hz_len=12,
        n_pol=16,
        n_action_samples=0,
        pol_cov=tuple(map(tuple, (np.eye(2) * 2.0).tolist())),
        temperature=1.0,
        kernel_mode="policy",
        kernel=ScaledGaussianKernel(),
        optimizer=optax.adam(0.5),
        inst_cost_fn=model.default_inst_cost,
        term_cost_fn=model.default_term_cost,
    )
    key = jax.random.PRNGKey(0)
    cstate = ctrl.init(key)
    state = jnp.asarray(model.init_state)

    @jax.jit
    def mpc_step(state, cstate, key):
        key, sub = jax.random.split(key)
        a_seq, cstate, data = ctrl.forward(state, cstate, None, sub, opt_steps=3)
        nxt = model.step(state[None], a_seq[0:1])[0]
        return nxt, cstate, key, data

    d0 = float(jnp.linalg.norm(state[:2]))
    for _ in range(50):
        state, cstate, key, data = mpc_step(state, cstate, key)
    dist = float(jnp.linalg.norm(state[:2]))
    assert dist < 0.6, f"DuSt did not approach goal: {d0} -> {dist}"
    assert np.isfinite(np.asarray(data.pol_weights)).all()


def test_dust_score_function_path_with_params():
    """MC action samples + sampled dynamics params (score-function grad)."""
    model = _point_mass()
    ctrl = DuSt(
        model=model,
        hz_len=8,
        n_pol=10,
        n_action_samples=5,
        n_params_samples=3,
        pol_cov=tuple(map(tuple, (np.eye(2) * 2.0).tolist())),
        kernel_mode="policy",
        kernel=ScaledGaussianKernel(),
        optimizer=optax.adam(0.5),
        inst_cost_fn=model.default_inst_cost,
        term_cost_fn=model.default_term_cost,
    )
    dist = du.Gaussian(mean=jnp.asarray([1.0]), cov=jnp.asarray([0.01]))
    key = jax.random.PRNGKey(2)
    cstate = ctrl.init(key)
    state = jnp.asarray(model.init_state)
    a_seq, cstate, data = jax.jit(
        lambda s, c, k: ctrl.forward(s, c, dist, k, opt_steps=2)
    )(state, cstate, key)
    assert a_seq.shape == (8, 2)
    assert np.isfinite(np.asarray(a_seq)).all()
    assert data.costs.shape == (2, 5, 10)


def test_dust_signature_kernel_mode():
    model = _point_mass()
    ctrl = DuSt(
        model=model,
        hz_len=8,
        n_pol=6,
        n_action_samples=0,
        kernel_mode="signature",
        sig_kernel=SignatureKernel(dyadic_order=1, bandwidth=4.0),
        optimizer=optax.adam(0.5),
        inst_cost_fn=model.default_inst_cost,
        term_cost_fn=model.default_term_cost,
    )
    key = jax.random.PRNGKey(3)
    cstate = ctrl.init(key)
    state = jnp.asarray(model.init_state)
    a_seq, cstate, data = jax.jit(
        lambda s, c, k: ctrl.forward(s, c, None, k, opt_steps=2)
    )(state, cstate, key)
    assert np.isfinite(np.asarray(a_seq)).all()
    assert np.isfinite(np.asarray(data.trace)).all()


def test_dust_primitives_stay_frozen():
    model = _point_mass()
    prims = jnp.zeros((2, 8, 2)).at[1].set(5.0)
    ctrl = DuSt(
        model=model,
        hz_len=8,
        n_pol=6,
        n_prim=2,
        kernel_mode="policy",
        kernel=ScaledGaussianKernel(),
        optimizer=optax.adam(0.5),
        inst_cost_fn=model.default_inst_cost,
        term_cost_fn=model.default_term_cost,
        roll_strategy="repeat",
    )
    key = jax.random.PRNGKey(4)
    cstate = ctrl.init(key, action_primitives=prims)
    state = jnp.asarray(model.init_state)
    _, new_cstate, _ = ctrl.forward(state, cstate, None, key, opt_steps=2)
    # primitives only rolled (repeat last action), values unchanged per-row
    np.testing.assert_allclose(
        np.asarray(new_cstate.pol_mean[0]), 0.0, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(new_cstate.pol_mean[1]), 5.0, atol=1e-6)


@pytest.mark.parametrize("strategy", ["repeat", "resample", "mean"])
def test_dust_roll_strategies(strategy):
    model = _point_mass()
    ctrl = DuSt(
        model=model,
        hz_len=6,
        n_pol=5,
        kernel_mode="policy",
        kernel=ScaledGaussianKernel(),
        optimizer=optax.adam(0.3),
        roll_strategy=strategy,
        inst_cost_fn=model.default_inst_cost,
        term_cost_fn=model.default_term_cost,
    )
    key = jax.random.PRNGKey(5)
    cstate = ctrl.init(key)
    before = np.asarray(cstate.pol_mean)
    _, new_cstate, _ = ctrl.forward(
        jnp.asarray(model.init_state), cstate, None, key, opt_steps=1
    )
    rolled = np.asarray(new_cstate.pol_mean)
    assert rolled.shape == before.shape
    assert np.isfinite(rolled).all()
    if strategy == "repeat":
        np.testing.assert_allclose(rolled[:, -1], rolled[:, -2], atol=1e-6)


def test_disco_cartpole_balance():
    """BASELINE config 2: cartpole stabilization with the MPPI baseline."""
    from sigsvgd_tpu.models import CartPoleModel

    model = CartPoleModel(dt=0.02)
    ctrl = DISCO(
        model=model,
        hz_len=25,
        n_actions=128,
        pol_cov=((0.4,),),
        temperature=0.2,
        ctrl_penalty=1.0,
        inst_cost_fn=model.balance_inst_cost,
        term_cost_fn=model.balance_term_cost,
    )
    cstate = ctrl.init()
    state = jnp.asarray([0.0, 0.0, 0.15, 0.0])  # tilted pole

    @jax.jit
    def mpc_step(state, cstate, key):
        cstate, _ = ctrl.forward(state, cstate, None, key)
        action, cstate = ctrl.act(cstate)
        return model.step(state[None], action)[0], cstate

    keys = jax.random.split(jax.random.PRNGKey(0), 120)
    max_theta = 0.0
    for i in range(120):
        state, cstate = mpc_step(state, cstate, keys[i])
        max_theta = max(max_theta, float(jnp.abs(state[2])))
    # pole never falls (uncontrolled dynamics pass |theta|=0.3 within ~0.5 s)
    assert max_theta < 0.25, f"pole fell: max |theta|={max_theta}"


def test_dust_trajectory_kernel_mode():
    """Per-dimension RBF on trajectory projections with AD pull-back
    (reference TrajectoryKernel path, trajectory_svgd.py:32-47)."""
    model = _point_mass()
    ctrl = DuSt(
        model=model,
        hz_len=8,
        n_pol=6,
        n_action_samples=4,
        kernel_mode="trajectory",
        kernel=ScaledGaussianKernel(),
        optimizer=optax.adam(0.5),
        inst_cost_fn=model.default_inst_cost,
        term_cost_fn=model.default_term_cost,
    )
    key = jax.random.PRNGKey(6)
    cstate = ctrl.init(key)
    state = jnp.asarray(model.init_state)
    a_seq, new_cstate, data = jax.jit(
        lambda s, c, k: ctrl.forward(s, c, None, k, opt_steps=2)
    )(state, cstate, key)
    assert np.isfinite(np.asarray(a_seq)).all()
    assert np.isfinite(np.asarray(new_cstate.pol_mean)).all()
