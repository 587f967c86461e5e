"""Closed-loop pendulum swing-up with DuSt (and a DISCO baseline).

Counterpart of reference ``examples/test_pendulum.py`` (DuSt, H=20, 1 policy,
Adam lr=0.1, 200 steps) and ``src/utils/_experiments.py:9-85`` (DISCO vs Gym).
The environment here is the model itself (no Gym dependency): the simulator
steps the same dynamics with the true parameters while the controller may
plan under sampled/uncertain ones.

Run: ``python -m sigsvgd_tpu.experiments.pendulum --controller dust``
"""
from __future__ import annotations

import argparse
import json
import time
from typing import Dict

import jax

from ..utils.helper import enable_compile_cache
import jax.numpy as jnp
import numpy as np
import optax

from ..controllers import DISCO, DuSt
from ..kernels import ScaledGaussianKernel
from ..models import PendulumModel
from ..utils import distributions as du


def run_dust(
    steps: int = 200,
    horizon: int = 20,
    n_pol: int = 1,
    n_params_samples: int = 0,
    opt_steps: int = 5,
    seed: int = 0,
) -> Dict:
    model = PendulumModel(dt=0.05)
    ctrl = DuSt(
        model=model,
        hz_len=horizon,
        n_pol=n_pol,
        n_action_samples=0,
        n_params_samples=n_params_samples,
        kernel_mode="policy",
        kernel=ScaledGaussianKernel(),
        optimizer=optax.adam(0.1),
        inst_cost_fn=model.swingup_inst_cost,
        term_cost_fn=model.swingup_term_cost,
    )
    params_dist = du.Gaussian(
        mean=jnp.asarray([9.8, 1.0, 1.0]), cov=jnp.eye(3) * 0.05
    )
    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    cstate = ctrl.init(k_init)
    state = jnp.asarray([jnp.pi, 0.0])  # hanging down

    @jax.jit
    def mpc_step(state, cstate, key):
        a_seq, cstate, _ = ctrl.forward(
            state, cstate, params_dist, key, opt_steps=opt_steps
        )
        nxt = model.step(state[None], a_seq[0:1])[0]
        return nxt, cstate, a_seq[0]

    states, actions = [np.asarray(state)], []
    step_keys = jax.random.split(key, steps)
    t0 = time.perf_counter()
    for i in range(steps):
        state, cstate, action = mpc_step(state, cstate, step_keys[i])
        states.append(np.asarray(state))
        actions.append(np.asarray(action))
    wall = time.perf_counter() - t0

    traj = np.stack(states)
    theta_wrapped = np.mod(traj[:, 0] + np.pi, 2 * np.pi) - np.pi
    final_err = float(np.abs(theta_wrapped[-20:]).mean())
    return {
        "trajectory": traj,
        "actions": np.stack(actions),
        "final_upright_error_rad": final_err,
        "wall_clock_s": wall,
        "solves_per_s": steps / wall,
    }


def run_disco(steps: int = 200, horizon: int = 30, n_actions: int = 256,
              n_pol: int = 1, seed: int = 0):
    model = PendulumModel(dt=0.05)
    # swing-up needs wide exploration: sigma=3 torque noise, low temperature
    # (tuned on-device; H=20/sigma=1 fails to pump enough energy)
    ctrl = DISCO(
        model=model,
        hz_len=horizon,
        n_actions=n_actions,
        n_pol=n_pol,
        pol_cov=((9.0,),),
        temperature=0.2,
        ctrl_penalty=1.0,
        n_params=4,
        inst_cost_fn=model.swingup_inst_cost,
        term_cost_fn=model.swingup_term_cost,
    )
    params_dist = du.Gaussian(
        mean=jnp.asarray([9.8, 1.0, 1.0]), cov=jnp.eye(3) * 0.05
    )
    key = jax.random.PRNGKey(seed)
    cstate = ctrl.init()
    state = jnp.asarray([jnp.pi, 0.0])

    @jax.jit
    def mpc_step(state, cstate, key):
        cstate, _ = ctrl.forward(state, cstate, params_dist, key)
        action, cstate = ctrl.act(cstate)
        nxt = model.step(state[None], action)[0]
        return nxt, cstate

    states = [np.asarray(state)]
    step_keys = jax.random.split(key, steps)
    t0 = time.perf_counter()
    for i in range(steps):
        state, cstate = mpc_step(state, cstate, step_keys[i])
        states.append(np.asarray(state))
    wall = time.perf_counter() - t0
    traj = np.stack(states)
    theta_wrapped = np.mod(traj[:, 0] + np.pi, 2 * np.pi) - np.pi
    return {
        "trajectory": traj,
        "final_upright_error_rad": float(np.abs(theta_wrapped[-20:]).mean()),
        "wall_clock_s": wall,
        "solves_per_s": steps / wall,
    }


def main():
    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--controller", default="dust", choices=["dust", "disco"])
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--n-pol", type=int, default=1)
    args = parser.parse_args()
    if args.controller == "dust":
        res = run_dust(steps=args.steps, n_pol=args.n_pol)
    else:
        res = run_disco(steps=args.steps, n_pol=args.n_pol)
    print(
        json.dumps(
            {
                "controller": args.controller,
                "final_upright_error_rad": round(res["final_upright_error_rad"], 4),
                "solves_per_s": round(res["solves_per_s"], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
