"""Sharded DuSt MPC solve: policy particles distributed over the mesh.

One MPC solve with the policy particles sharded over 'dp': rollouts, costs,
likelihood gradients and optimizer updates are local to each shard; the
global couplings are a handful of collectives per SVGD step —

  * ``pmin`` for the exponentiated-utility min-subtraction,
  * ``all_gather`` of policy means for the GMM prior gradient,
  * kernel terms: policy mode gathers particle rows and forms Gram rows
    (``parallel.svgd._velocity_local``); SIGNATURE mode all_gathers the τ
    trajectory projections and each shard solves its ``[n_local, N]`` (or 2-D
    ``[n_local, N/sp]``) block of the Goursat-PDE Gram locally, pulling the
    kernel gradient back through its own rollouts,
  * ``psum`` for the final softmax policy weights.

Supports every single-device DuSt feature: all three kernel modes
(``policy``/``trajectory``/``signature``), the autodiff AND Monte-Carlo
likelihood-gradient paths (``n_action_samples > 0``), dynamics-parameter
samples (``n_params_samples > 0``), action primitives (the gradient mask is
sliced per shard), weighted GMM priors, and the repeat/mean/resample horizon
rolls. Monte-Carlo and resample-roll draws replicate the single-device PRNG
stream (each shard draws the full tensor with the shared key and slices its
rows), so results match the single-device :meth:`DuSt.forward` to fp
tolerance — asserted per feature in tests/test_parallel_dust.py.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..controllers.dust import DuSt, DuStState
from ..inference.svgd import ScoreResult, SVGDState
from ..utils import distributions as du
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
    col_axis: Optional[str] = None,
    params_dist: Optional[du.Distribution] = None,
) -> Tuple[jax.Array, DuStState]:
    """Sharded MPC solve. Supports every single-device DuSt feature — the
    three roll strategies, action primitives (gradient mask sliced per
    shard), weighted prior, and all three kernel modes — with one
    restriction: trajectory/signature kernels need a FIXED static bandwidth
    (per-shard median heuristics over row blocks would disagree across the
    mesh)."""
    assert ctrl.kernel_mode in ("policy", "trajectory", "signature")
    if ctrl.kernel_mode == "signature":
        assert (
            ctrl.sig_kernel.bandwidth is not None
            or ctrl.sig_kernel.static == "linear"
        ), "sharded signature mode requires a fixed static bandwidth"
    if ctrl.kernel_mode == "trajectory":
        assert ctrl.kernel.bandwidth_fn is not None, (
            "sharded trajectory mode requires a fixed kernel bandwidth "
            "(bandwidth_fn ignoring its argument)"
        )
    ndev = mesh.shape[axis]
    assert ctrl.n_total % ndev == 0
    if col_axis is not None:
        # the Gram column split drops remainder columns silently otherwise
        assert ctrl.n_total % mesh.shape[col_axis] == 0, (
            f"n_total ({ctrl.n_total}) must divide the '{col_axis}' axis "
            f"({mesh.shape[col_axis]})"
        )

    sampler = ctrl._sampler()
    prior_var = ctrl._prior_var()
    n_samples = ctrl.n_action_samples
    cov = ctrl._pol_cov()
    chol = jnp.linalg.cholesky(cov)
    pre = jnp.linalg.inv(cov)

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
        in_specs=(P(), P(axis), opt_specs, P(), P()),
        out_specs=(P(), P(axis), opt_specs, P(axis)),
        check_rep=False,
    )
    def solve(state, pol_local, opt_state_local, prior_weights, key):
        n_local = pol_local.shape[0]
        row0 = lax.axis_index(axis) * n_local
        # GMM prior is anchored at the solve's INITIAL policies (gathered
        # once — the reference builds `prior` per forward, dust.py:484)
        prior_means = lax.all_gather(
            pol_local.reshape(n_local, -1), axis, tiled=True
        )
        n_total = prior_means.shape[0]

        if ctrl.n_prim > 0:
            # slice this shard's rows of the action-primitive freeze mask
            mask_local = lax.dynamic_slice_in_dim(
                sampler.gradient_mask, row0, n_local, axis=0
            )
            local_sampler = dataclasses.replace(
                sampler, gradient_mask=mask_local
            )
        else:
            local_sampler = sampler

        # mirror the single-device key flow exactly (dust.py::forward)
        key2, key_par = jax.random.split(key)
        if ctrl.n_params_samples > 0 and params_dist is not None:
            params_mat = du.sample(
                params_dist, key_par, (ctrl.n_params_samples,)
            )
            params_mat = jnp.atleast_2d(
                params_mat.reshape(ctrl.n_params_samples, -1)
            )
            if ctrl.params_log_space:
                params_mat = jnp.exp(params_mat)
        else:
            params_mat = None
        all_keys = jax.random.split(key2, opt_steps + 1)

        def kernel_terms(pol, trajs, offsets):
            """Trajectory-kernel Gram block + pull-back gradient (local
            rows): all_gather the τ projections, slice this shard's Gram
            columns, and differentiate the row-block sum back through the
            local rollouts."""
            tau_local = ctrl._tau(trajs)
            tau_all = lax.stop_gradient(
                lax.all_gather(tau_local, axis, tiled=True)
            )
            if col_axis is not None:
                sp = lax.psum(1, col_axis)
                assert tau_all.shape[0] % sp == 0, (tau_all.shape, sp)
                cols = tau_all.shape[0] // sp
                col0 = lax.axis_index(col_axis) * cols
                tau_cols = lax.dynamic_slice_in_dim(tau_all, col0, cols, axis=0)
            else:
                tau_cols = tau_all

            def gram_sum(pm):
                acts = pm if offsets is None else pm[None] + offsets
                _, tr = ctrl._rollout_costs(state, acts, params_mat)
                t = ctrl._tau(tr)
                if ctrl.kernel_mode == "signature":
                    k = ctrl.sig_kernel.gram(t, tau_cols)
                else:  # trajectory: per-dim RBF mean (trajectory_svgd.py:32-47)
                    k = 0.0
                    for i in range(t.shape[-1]):
                        k = k + ctrl.kernel(
                            t[..., i], tau_cols[..., i], compute_grad=False
                        )
                    k = k / t.shape[-1]
                return jnp.sum(k), k

            (_, k_rows), grad_k = jax.value_and_grad(gram_sum, has_aux=True)(pol)
            return k_rows, grad_k

        def svgd_step(carry, step_key):
            pol, opt_st = carry

            if n_samples > 0:
                # replicate the single-device draw, slice this shard's rows
                eps_full = jax.random.normal(
                    step_key,
                    (n_samples, n_total) + pol.shape[1:],
                    pol.dtype,
                )
                eps = lax.dynamic_slice_in_dim(eps_full, row0, n_local, axis=1)
                actions = pol[None] + eps @ chol.T
                costs, trajs = ctrl._rollout_costs(state, actions, params_mat)
                # softmax over the sample axis: the global min-shift cancels
                log_lik_local = -costs / ctrl.temperature
                w = jax.nn.softmax(log_lik_local, axis=0)[..., None, None]
                grad_log_pol = (actions - pol[None]) @ pre
                grad_lik = jnp.sum(w * grad_log_pol, axis=0)
                offsets = lax.stop_gradient(actions - pol[None])
            else:
                # the min-subtraction is detached, so ∇ Σ log_lik = -∇ Σ c / α
                def neg_cost_sum(pm):
                    c, tr = ctrl._rollout_costs(state, pm, params_mat)
                    return -jnp.sum(c) / ctrl.temperature, (c, tr)

                (_, (costs, trajs)), grad_lik = jax.value_and_grad(
                    neg_cost_sum, has_aux=True
                )(pol)
                offsets = None

            grad_pri = grad_gmm_log_p(
                pol.reshape(n_local, -1),
                prior_means,
                prior_var,
                prior_weights,
            ).reshape(pol.shape)

            if ctrl.kernel_mode in ("signature", "trajectory"):
                k_rows, grad_k = kernel_terms(pol, trajs, offsets)
            else:
                k_rows = grad_k = None

            score = ScoreResult(
                grad_log_p=grad_pri + grad_lik,
                k_xx=k_rows,
                grad_k=grad_k,
                loss=costs,
            )
            phi, _ = _velocity_local(
                local_sampler, pol, score, jnp.zeros((), jnp.int32), axis,
                col_axis,
            )
            pol, opt_st = local_sampler.apply_update(pol, -phi, opt_st)
            return (pol, opt_st), costs

        (pol, opt_state_local), costs_seq = lax.scan(
            svgd_step, (pol_local, opt_state_local), all_keys[:opt_steps]
        )

        # global softmax policy weights from the last iteration's costs
        last = costs_seq[-1]
        if n_samples > 0:
            last = jnp.mean(last, axis=0)  # average log-lik over samples
        gmin = lax.pmin(jnp.min(last), axis)
        logits = -(last - gmin) / ctrl.temperature
        z = lax.psum(jnp.sum(jnp.exp(logits)), axis)
        weights_local = jnp.exp(logits) / z

        # global best policy: owner shard contributes, psum broadcasts.
        # Ties broken by LOWEST GLOBAL INDEX (matching single-device argmax),
        # not weight-equality alone — exact cross-shard ties would otherwise
        # SUM the tied policies.
        best_local = jnp.argmax(weights_local)
        best_w = weights_local[best_local]
        gmax_w = lax.pmax(best_w, axis)
        cand_idx = jnp.where(best_w == gmax_w, row0 + best_local, n_total)
        owner_idx = lax.pmin(cand_idx, axis)
        is_owner = (row0 + best_local == owner_idx).astype(pol.dtype)
        a_seq = lax.psum(pol[best_local] * is_owner, axis)

        # -- horizon roll (mirrors DuSt._roll, ref dust.py:428-444) -------
        rolled = jnp.roll(pol, -1, axis=-2)
        if ctrl.roll_strategy == "repeat":
            last = rolled[..., -2, :]
        elif ctrl.roll_strategy == "mean":
            last = pol.mean(axis=-2)
        elif ctrl.roll_strategy == "resample":
            # replicate the single-device draw from the (gathered) GMM prior
            # with the shared roll key, then slice this shard's rows
            prior = du.ParticleGMM(
                means=prior_means, var=prior_var, weights=prior_weights
            )
            samp = du.sample(prior, all_keys[opt_steps], (n_total,))
            samp = samp.reshape(n_total, ctrl.hz_len, ctrl.dim_a)
            last = lax.dynamic_slice_in_dim(samp, row0, n_local, axis=0)[
                ..., -1, :
            ]
        else:
            raise ValueError(f"Invalid roll strategy: {ctrl.roll_strategy}")
        rolled = rolled.at[..., -1, :].set(last)
        return a_seq, rolled, opt_state_local, weights_local

    a_seq, new_pol, new_opt_state, weights = solve(
        state, cstate.pol_mean, opt_state, cstate.prior_weights, key
    )
    if ctrl.roll_opt_state:
        # horizon roll of policy-aligned optimizer leaves (axis -2 is the
        # horizon — unsharded — so this is sharding-preserving)
        from ..inference.svgd import roll_opt_state as _roll_state

        new_opt_state = _roll_state(
            new_opt_state, (ctrl.n_total, ctrl.hz_len, ctrl.dim_a)
        )
    new_cstate = DuStState(
        pol_mean=new_pol,
        prior_weights=(
            weights if ctrl.weighted_prior else jnp.ones_like(weights)
        ),
        svgd_state=SVGDState(
            opt_state=new_opt_state, step=cstate.svgd_state.step + opt_steps
        ),
    )
    return a_seq, new_cstate


def make_sharded_mpc_step(
    ctrl: DuSt,
    mesh: Mesh,
    opt_steps: int,
    axis: str = "dp",
    col_axis: Optional[str] = None,
    params_dist: Optional[du.Distribution] = None,
):
    """Jitted closed-loop step: sharded solve + environment transition."""

    @jax.jit
    def step(state, cstate, key):
        a_seq, cstate = sharded_dust_forward(
            ctrl, state, cstate, key, opt_steps, mesh, axis, col_axis,
            params_dist,
        )
        nxt = ctrl.model.step(state[None], a_seq[0:1])[0]
        return nxt, cstate, a_seq

    return step
