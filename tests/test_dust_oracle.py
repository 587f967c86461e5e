"""Golden-math parity test: one deterministic DuSt iteration vs a hand-written
numpy oracle (the reference-semantics check SURVEY.md §4 calls for, since the
reference's torch stack cannot run in this image).

Configuration chosen so every term has a closed form: velocity-control point
mass (rollout linear in actions), quadratic costs, autodiff likelihood path
(no action/param sampling), fixed-bandwidth RBF kernel on policies, raw-lr
SVGD update, no hyper-prior.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sigsvgd_tpu.controllers import DuSt
from sigsvgd_tpu.kernels import GaussianKernel
from sigsvgd_tpu.models import ParticleModel

DT = 0.1
H = 3
N = 4
ALPHA = 1.3
LR = 0.05
BW = 2.0
GOAL = np.array([1.0, -0.5])


def _numpy_oracle(pol, state):
    """One DuSt SVGD step in numpy (float64)."""
    pol = pol.astype(np.float64)  # [N, H, 2]
    s0 = state.astype(np.float64)[:2]

    # rollout: s_t = s0 + dt * cumsum(a);  states[t] for t=1..H
    states = s0 + DT * np.cumsum(pol, axis=1)  # [N, H, 2]

    # inst cost on states[0..H-1] = [s0, states[:-1]] plus actions; terminal on states[-1]
    inst_states = np.concatenate(
        [np.broadcast_to(s0, (N, 1, 2)), states[:, :-1]], axis=1
    )
    inst = ((inst_states - GOAL) ** 2).sum(-1).sum(-1) + 0.1 * (pol**2).sum((1, 2))
    term = 10.0 * ((states[:, -1] - GOAL) ** 2).sum(-1)
    costs = inst + term

    # d costs / d pol (closed form): state s_t depends on a_tau for tau <= t
    grad_c = 0.2 * pol.copy()  # action quadratic term
    for i in range(N):
        for tau in range(H):
            # inst states at t=1..H-1 (indices of states[:, t]) include a_tau for tau <= t
            for t in range(tau, H - 1):
                grad_c[i, tau] += 2.0 * (states[i, t] - GOAL) * DT
            grad_c[i, tau] += 10.0 * 2.0 * (states[i, H - 1] - GOAL) * DT

    # exponentiated utility with detached min
    grad_lik = -grad_c / ALPHA

    # GMM prior grad (means = pol itself, equal weights, var = 1 per dim)
    flat = pol.reshape(N, -1)
    grad_pri = -(flat - flat.mean(0)) / 1.0

    score = grad_pri + grad_lik.reshape(N, -1)

    # RBF kernel, fixed bandwidth
    d2 = ((flat[:, None] - flat[None]) ** 2).sum(-1)
    K = np.exp(-0.5 * d2 / BW**2)
    dK = (K @ flat - K.sum(1, keepdims=True) * flat) / BW**2

    phi = (K @ score - dK) / N
    return (flat + LR * phi).reshape(N, H, 2)


def test_dust_matches_numpy_oracle():
    model = ParticleModel.create(
        dt=DT, control_type="velocity", map_size=(10, 10), map_cell_size=0.5,
        target_state=(GOAL[0], GOAL[1]),
    )

    def inst_cost(states, actions=None, **_):
        c = jnp.sum((states - jnp.asarray(GOAL)) ** 2, -1)
        if actions is not None:
            c = c + 0.1 * jnp.sum(actions**2, -1)
        return c

    def term_cost(states, **_):
        return 10.0 * jnp.sum((states - jnp.asarray(GOAL)) ** 2, -1)

    ctrl = DuSt(
        model=model,
        hz_len=H,
        n_pol=N,
        n_action_samples=0,
        temperature=ALPHA,
        kernel_mode="policy",
        kernel=GaussianKernel(bandwidth_fn=lambda _: BW),
        optimizer=None,
        lr=LR,
        pol_hyper_prior=False,
        inst_cost_fn=inst_cost,
        term_cost_fn=term_cost,
    )
    key = jax.random.PRNGKey(0)
    cstate = ctrl.init(key)
    state = jnp.zeros((2,))

    _, new_state, data = ctrl.forward(state, cstate, None, key, opt_steps=1)

    got = np.asarray(data.trace[-1])  # particles after the single SVGD step
    want = _numpy_oracle(np.asarray(cstate.pol_mean), np.zeros(4))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
