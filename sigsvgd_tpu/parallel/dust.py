"""Sharded DuSt MPC solve: policy particles distributed over the mesh.

One MPC solve with the policy particles sharded over 'dp': rollouts, costs,
likelihood gradients and optimizer updates are local to each shard; the
global couplings are exactly four collectives per SVGD step —

  * ``pmin`` for the exponentiated-utility min-subtraction,
  * ``all_gather`` of policy means for the GMM prior gradient,
  * ``all_gather`` + Gram rows for the kernel terms (via
    ``parallel.svgd._velocity_local``),
  * ``psum`` for the final softmax policy weights.

Covers the policy-RBF kernel mode with the autodiff likelihood path (the
production MPC configuration benchmarked in ``bench.py``); matches the
single-device :meth:`DuSt.forward` to fp tolerance (tests/test_parallel.py).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..controllers.dust import DuSt, DuStState
from ..inference.svgd import ScoreResult, SVGDState
from ..utils.math import grad_gmm_log_p
from .svgd import _velocity_local


def sharded_dust_forward(
    ctrl: DuSt,
    state: jax.Array,
    cstate: DuStState,
    key: jax.Array,
    opt_steps: int,
    mesh: Mesh,
    axis: str = "dp",
) -> Tuple[jax.Array, DuStState]:
    """Sharded MPC solve. Restrictions (asserted): ``kernel_mode='policy'``,
    ``n_action_samples=0``, ``n_params_samples=0``, no action primitives."""
    assert ctrl.kernel_mode == "policy"
    assert ctrl.n_action_samples == 0 and ctrl.n_params_samples == 0
    assert ctrl.n_prim == 0
    assert ctrl.roll_strategy == "repeat", "sharded DuSt implements 'repeat' only"
    assert not ctrl.weighted_prior, "sharded DuSt uses uniform prior weights"
    ndev = mesh.shape[axis]
    assert ctrl.n_total % ndev == 0

    sampler = ctrl._sampler()
    prior_var = ctrl._prior_var()

    # optimizer-state leaves follow the particle sharding when their leading
    # dim is the particle axis (adam moments), else replicate (step counts)
    opt_state = cstate.svgd_state.opt_state
    opt_specs = jax.tree_util.tree_map(
        lambda leaf: P(axis)
        if getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] == ctrl.n_total
        else P(),
        opt_state,
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), opt_specs, P()),
        out_specs=(P(), P(axis), opt_specs, P(axis)),
        check_rep=False,
    )
    def solve(state, pol_local, opt_state_local, key):
        n_local = pol_local.shape[0]
        # GMM prior is anchored at the solve's INITIAL policies (gathered
        # once — the reference builds `prior` per forward, dust.py:484)
        prior_means = lax.all_gather(
            pol_local.reshape(n_local, -1), axis, tiled=True
        )
        n_total = prior_means.shape[0]

        def svgd_step(carry, step_key):
            pol, opt_st = carry

            # the min-subtraction is detached, so ∇ Σ log_lik = -∇ Σ c / α —
            # differentiate the raw cost sum (pmin has no AD rule and is not
            # needed under the gradient)
            def neg_cost_sum(pm):
                costs, _ = ctrl._rollout_costs(state, pm, None)
                return -jnp.sum(costs) / ctrl.temperature, costs

            (_, costs), grad_lik = jax.value_and_grad(
                neg_cost_sum, has_aux=True
            )(pol)

            grad_pri = grad_gmm_log_p(
                pol.reshape(n_local, -1),
                prior_means,
                prior_var,
                jnp.ones((n_total,), pol.dtype),
            ).reshape(pol.shape)

            score = ScoreResult(grad_log_p=grad_pri + grad_lik, loss=costs)
            phi, _ = _velocity_local(sampler, pol, score, jnp.zeros((), jnp.int32), axis)
            pol, opt_st = sampler.apply_update(pol, -phi, opt_st)
            return (pol, opt_st), costs

        keys = jax.random.split(key, opt_steps)
        (pol, opt_state_local), costs_seq = lax.scan(
            svgd_step, (pol_local, opt_state_local), keys
        )

        # global softmax policy weights from the last iteration's costs
        last = costs_seq[-1]
        gmin = lax.pmin(jnp.min(last), axis)
        logits = -(last - gmin) / ctrl.temperature
        z = lax.psum(jnp.sum(jnp.exp(logits)), axis)
        weights_local = jnp.exp(logits) / z

        # global best policy: owner shard contributes, psum broadcasts
        best_local = jnp.argmax(weights_local)
        best_w = weights_local[best_local]
        gmax_w = lax.pmax(best_w, axis)
        is_owner = (best_w == gmax_w).astype(pol.dtype)
        a_seq = lax.psum(pol[best_local] * is_owner, axis)
        # (exact ties across shards would sum; measure-zero for continuous costs)

        rolled = jnp.roll(pol, -1, axis=-2)
        rolled = rolled.at[..., -1, :].set(rolled[..., -2, :])  # repeat strategy
        return a_seq, rolled, opt_state_local, weights_local

    a_seq, new_pol, new_opt_state, weights = solve(
        state, cstate.pol_mean, opt_state, key
    )
    new_cstate = DuStState(
        pol_mean=new_pol,
        prior_weights=jnp.ones_like(cstate.prior_weights),
        svgd_state=SVGDState(
            opt_state=new_opt_state, step=cstate.svgd_state.step + opt_steps
        ),
    )
    return a_seq, new_cstate


def make_sharded_mpc_step(
    ctrl: DuSt, mesh: Mesh, opt_steps: int, axis: str = "dp"
):
    """Jitted closed-loop step: sharded solve + environment transition."""

    @jax.jit
    def step(state, cstate, key):
        a_seq, cstate = sharded_dust_forward(
            ctrl, state, cstate, key, opt_steps, mesh, axis
        )
        nxt = ctrl.model.step(state[None], a_seq[0:1])[0]
        return nxt, cstate, a_seq

    return step
