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
        jax.random.normal(key_eps, (NA, H, 2))
    )  # identity pol_cov -> chol = I
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

    np.testing.assert_allclose(np.asarray(data.costs), costs, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(data.omega), omega, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state.a_seq), plan, rtol=1e-4, atol=1e-5)


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
