"""Golden-math parity: one DISCO (MPPI) update vs a numpy oracle with the
exact same sampled perturbations (replayed through the same PRNG calls)."""
import jax
import jax.numpy as jnp
import numpy as np

from sigsvgd_tpu.controllers import DISCO
from sigsvgd_tpu.models import ParticleModel

DT = 0.1
H = 4
NA = 16
TEMP = 0.7
GOAL = np.array([1.0, -0.5])


def test_disco_matches_numpy_oracle():
    model = ParticleModel.create(
        dt=DT, control_type="velocity", map_size=(10, 10), map_cell_size=0.5,
        target_state=(GOAL[0], GOAL[1]),
    )

    def inst_cost(states, actions=None, **_):
        c = jnp.sum((states - jnp.asarray(GOAL)) ** 2, -1)
        if actions is not None:
            c = c + 0.05 * jnp.sum(actions**2, -1)
        return c

    def term_cost(states, **_):
        return 5.0 * jnp.sum((states - jnp.asarray(GOAL)) ** 2, -1)

    ctrl = DISCO(
        model=model,
        hz_len=H,
        n_actions=NA,
        temperature=TEMP,
        ctrl_penalty=1.0,  # a_reg = 0: no control-cost trace term
        inst_cost_fn=inst_cost,
        term_cost_fn=term_cost,
    )
    cstate = ctrl.init(jnp.ones((H, 2)) * 0.3)
    state = jnp.zeros((2,))
    key = jax.random.PRNGKey(5)

    new_state, data = ctrl.forward(state, cstate, None, key)

    # --- numpy oracle, replaying the identical perturbations -------------
    key_eps, _ = jax.random.split(key)
    eps = np.asarray(
        jax.random.normal(key_eps, (NA, 1, H, 2))[:, 0]
    )  # identity pol_cov -> chol = I; n_pol=1 axis matches forward's draw
    a_seq = np.full((H, 2), 0.3)
    actions = a_seq + eps  # [NA, H, 2]

    s = np.zeros((NA, 2))
    costs = np.zeros(NA)
    for t in range(H):
        costs += ((s - GOAL) ** 2).sum(-1) + 0.05 * (actions[:, t] ** 2).sum(-1)
        s = s + actions[:, t] * DT
    costs += 5.0 * ((s - GOAL) ** 2).sum(-1)

    shifted = -(costs - costs.min()) / TEMP
    omega = np.exp(shifted) / np.exp(shifted).sum()
    plan = a_seq + np.einsum("n,nha->ha", omega, eps)

    np.testing.assert_allclose(
        np.asarray(data.costs[:, 0]), costs, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(data.omega[:, 0]), omega, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(new_state.a_seq), plan, rtol=1e-4, atol=1e-5)


def test_disco_two_policy_ensemble_matches_numpy_oracle():
    """Multi-policy ensemble golden (reference ``disco.py:318-400``): per-
    policy softmax over the shared baseline, a_mix from the per-policy
    log-normalizers, per-policy plan updates, and the argmax/average
    mixing strategies with the a_mat roll."""
    model = ParticleModel.create(
        dt=DT, control_type="velocity", map_size=(10, 10), map_cell_size=0.5,
        target_state=(GOAL[0], GOAL[1]),
    )

    def inst_cost(states, actions=None, **_):
        return jnp.sum((states - jnp.asarray(GOAL)) ** 2, -1)

    ctrl = DISCO(
        model=model, hz_len=H, n_actions=NA, n_pol=2, temperature=TEMP,
        ctrl_penalty=1.0, inst_cost_fn=inst_cost,
    )
    pol0 = np.stack(
        [np.full((H, 2), 0.3), np.full((H, 2), -0.2)]
    ).astype(np.float32)
    cstate = ctrl.init(jnp.asarray(pol0))
    state = jnp.zeros((2,))
    key = jax.random.PRNGKey(9)
    new_state, data = jax.jit(lambda s, c, k: ctrl.forward(s, c, None, k))(
        state, cstate, key
    )

    # numpy oracle with the identical perturbations
    key_eps, _ = jax.random.split(key)
    eps = np.asarray(jax.random.normal(key_eps, (NA, 2, H, 2)))
    actions = pol0[None] + eps  # [NA, 2, H, 2]
    s = np.zeros((NA, 2, 2))
    costs = np.zeros((NA, 2))
    for t in range(H):
        costs += ((s - GOAL) ** 2).sum(-1)
        s = s + actions[:, :, t] * DT
    # forward sums inst over the horizon only (term_cost_fn=None -> 0)

    shifted = -(costs - costs.min()) / TEMP          # shared baseline
    eta = np.log(np.exp(shifted).sum(0))             # [2] log-normalizers
    omega = np.exp(shifted - eta[None])              # per-policy softmax
    a_mat = pol0 + np.einsum("np,npha->pha", omega, eps)
    a_mix = np.exp(eta - np.log(np.exp(eta).sum()))

    np.testing.assert_allclose(np.asarray(data.costs), costs, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(data.omega), omega, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state.a_mat), a_mat, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state.a_mix), a_mix, rtol=1e-4, atol=1e-5)
    # each column of omega is itself a softmax
    np.testing.assert_allclose(np.asarray(data.omega).sum(0), [1.0, 1.0], atol=1e-5)

    # argmax commits the highest-weight policy's plan; average the mixture
    lo = np.asarray(model.action_space.low)
    hi = np.asarray(model.action_space.high)
    act_argmax, rolled = ctrl.act(new_state, strategy="argmax")
    want = a_mat[int(np.argmax(a_mix))]
    np.testing.assert_allclose(
        np.asarray(act_argmax[0]), np.clip(want[0], lo, hi), rtol=1e-4,
        atol=1e-5,
    )
    act_avg, _ = ctrl.act(new_state, strategy="average")
    want_avg = np.einsum("p,pha->ha", a_mix, a_mat)
    np.testing.assert_allclose(
        np.asarray(act_avg[0]), np.clip(want_avg[0], lo, hi), rtol=1e-4,
        atol=1e-5,
    )
    # the whole ensemble rolls with the horizon (disco.py:398-399)
    np.testing.assert_allclose(np.asarray(rolled.a_mat[:, -1]), 0.0, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(rolled.a_mat[:, 0]), a_mat[:, 1], rtol=1e-4, atol=1e-5
    )


def test_disco_act_clips_and_rolls():
    model = ParticleModel.create(
        dt=DT, control_type="velocity", max_speed=1.0,
        map_size=(10, 10), map_cell_size=0.5,
    )
    ctrl = DISCO(model=model, hz_len=3, n_actions=4)
    cstate = ctrl.init(jnp.asarray([[5.0, -5.0], [0.5, 0.5], [0.2, -0.2]]))
    action, rolled = ctrl.act(cstate)
    np.testing.assert_allclose(np.asarray(action[0]), [1.0, -1.0])  # clipped
    np.testing.assert_allclose(np.asarray(rolled.a_seq[-1]), [0.0, 0.0])  # zero fill
    np.testing.assert_allclose(np.asarray(rolled.a_seq[0]), [0.5, 0.5])  # shifted
