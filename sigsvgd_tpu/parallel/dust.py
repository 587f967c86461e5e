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
from jax import shard_map

from ..controllers.dust import DuSt, DuStState
from ..inference.svgd import ScoreResult, SVGDState
from ..utils import distributions as du
from ..utils.math import grad_gmm_log_p
from .svgd import _velocity_local


def _triangle_groups(n_total: int, ndev: int) -> int:
    """Row-group count ``g`` for the triangle Gram decomposition.

    Finer groups shrink BOTH triangle-mode overheads (VERDICT r3 item 3):
    the diagonal-block waste — each (a, a) block solves the full (N/g)²
    square, so total block pairs are N²(g+1)/(2g) vs the single-chip
    N(N+1)/2 — and the ceil-imbalance of assigning g(g+1)/2 equal blocks
    round-robin to ndev devices. The floor of 64 rows per group keeps each
    block's (N/g)² pair list an exact multiple of the 2048-pair Pallas tile
    (64² = 2 tiles), so finer granularity costs no padding. At the flagship
    N=1024 this yields g=16 for ndev ∈ {2,4,8}: 0.94 projected efficiency
    at EVERY device count (docs/scaling_model.md) vs 0.80 at ndev=2 with
    the old g = 2·ndev."""
    best = 2 * ndev if n_total % (2 * ndev) == 0 else ndev
    m = best // ndev + 1
    while m * ndev * 64 <= n_total:
        if n_total % (m * ndev) == 0:
            best = m * ndev
        m += 1
    return best


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
    gram_mode: str = "auto",
) -> Tuple[jax.Array, DuStState]:
    """Sharded MPC solve. Supports every single-device DuSt feature — the
    three roll strategies, action primitives (gradient mask sliced per
    shard), weighted prior, and all three kernel modes, with fixed OR
    median-heuristic bandwidths: signature modes reproduce the single-device
    ``_subsampled_bandwidth`` from the gathered τ (no gradient flows through
    it there, ``sigkernel.py::gram_and_grad``), and the trajectory mode uses
    a differentiable distributed median over the sharded pair-distance
    blocks (``parallel.svgd.distributed_median_diff``) so even the
    single-device gradient flow through ``bw_median`` is matched.

    ``gram_mode`` selects the signature-Gram decomposition (all numerically
    identical up to fp summation order — asserted in
    tests/test_parallel_dust.py):

      * ``"triangle"`` (the 1-D auto default): balanced upper-triangle
        blocks — halves the PDE work vs full row blocks, matching the
        single chip's symmetric solve; see :func:`triangle_terms` inside.
      * ``"ring"``: ring-attention-style ppermute pipelining — the Gram is
        computed in ``ndev`` column-chunk blocks while the (τ, score)
        chunks rotate around the mesh; each collective-permute moves only
        ``N/ndev`` rows and is independent of that step's block solve, so
        XLA's collective pipeliner overlaps transfer with PDE compute
        (the all_gather it replaces sits on the critical path).
      * ``"gather"``: all_gather τ up front, solve full ``[n_local, N]``
        (or 2-D ``[n_local, N/sp]`` with ``col_axis``) row blocks."""
    assert ctrl.kernel_mode in ("policy", "trajectory", "signature")
    if gram_mode == "auto":
        gram_mode = (
            "triangle"
            if ctrl.kernel_mode == "signature" and col_axis is None
            else "gather"
        )
    assert gram_mode in ("gather", "ring", "triangle")
    if gram_mode in ("ring", "triangle"):
        assert ctrl.kernel_mode == "signature" and col_axis is None, (
            "ring/triangle Gram decompositions apply to the 1-D sharded "
            "signature mode"
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
        check_vma=False,
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

        def sig_with_bw(tau_all):
            """Signature kernel with the single-device bandwidth: the median
            heuristic over the gathered τ reproduces
            ``SignatureKernel._subsampled_bandwidth`` exactly (no gradient
            flows through it on the single-device path either — the VJP in
            ``gram_and_grad`` closes over h as a constant)."""
            sig = ctrl.sig_kernel
            if sig.bandwidth is not None or sig.static == "linear":
                return sig
            h = sig._subsampled_bandwidth(tau_all, tau_all)
            return dataclasses.replace(sig, bandwidth=h)

        def traj_h(t_local, ref_cols, dim):
            """Per-dim trajectory-kernel bandwidth: the single-device call
            takes ``bw_median`` over the FULL [N, N] distance tensor — here
            each device holds a [n_local, m] block, so the global median is
            recovered with the differentiable distributed bisection (matches
            the single-device gradient flow through the selected element)."""
            if ctrl.kernel.bandwidth_fn is not None:
                return None  # kernel computes its own fixed bandwidth
            from ..utils.math import bw_from_median, pw_dist_sq

            d2 = pw_dist_sq(
                t_local[..., dim].reshape(t_local.shape[0], -1),
                ref_cols[..., dim].reshape(ref_cols.shape[0], -1),
            )
            axes = (axis,) if col_axis is None else (axis, col_axis)
            from .svgd import distributed_median_diff

            med = distributed_median_diff(d2, axes)
            return bw_from_median(med, n_total, ctrl.kernel.bw_scale)

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

            sig = sig_with_bw(tau_all)

            def gram_sum(pm):
                acts = pm if offsets is None else pm[None] + offsets
                _, tr = ctrl._rollout_costs(state, acts, params_mat)
                t = ctrl._tau(tr)
                if ctrl.kernel_mode == "signature":
                    k = sig.gram(t, tau_cols)
                else:  # trajectory: per-dim RBF mean (trajectory_svgd.py:32-47)
                    k = 0.0
                    for i in range(t.shape[-1]):
                        k = k + ctrl.kernel(
                            t[..., i], tau_cols[..., i],
                            h=traj_h(t, tau_cols, i), compute_grad=False,
                        )
                    k = k / t.shape[-1]
                return jnp.sum(k), k

            (_, k_rows), grad_k = jax.value_and_grad(gram_sum, has_aux=True)(pol)
            return k_rows, grad_k

        def ring_terms(pol, trajs, offsets, s_local):
            """Ring-pipelined signature Gram: ``ks = Σ_c K(τ_rows, τ_c) s_c``
            accumulated while the (τ, score) chunks rotate over ``axis`` —
            no all_gather; each permute overlaps the next block's PDE solve.
            Returns (ks [n_local, D], repulsion grad ∂Σk/∂pol)."""

            def tau_of(pm):
                acts = pm if offsets is None else pm[None] + offsets
                _, tr = ctrl._rollout_costs(state, acts, params_mat)
                return ctrl._tau(tr)

            tau_rows, vjp_tau = jax.vjp(tau_of, pol)
            if ctrl.sig_kernel.bandwidth is None and ctrl.sig_kernel.static != "linear":
                # bandwidth-only gather (τ is [N, T, C] — a sliver next to
                # the Gram work the ring exists to decompose); the Gram
                # chunks themselves still rotate via ppermute
                tau_bw = lax.stop_gradient(
                    lax.all_gather(tau_rows, axis, tiled=True)
                )
                sig = sig_with_bw(tau_bw)
            else:
                sig = ctrl.sig_kernel
            perm = [(i, (i + 1) % ndev) for i in range(ndev)]

            def ring_step(carry, _):
                chunk_tau, chunk_s, ks, dtau = carry
                k_blk, vjp_blk = jax.vjp(
                    lambda tr: sig.gram(tr, chunk_tau), tau_rows
                )
                ks = ks + k_blk @ chunk_s
                (d,) = vjp_blk(jnp.ones_like(k_blk))
                dtau = dtau + d
                chunk_tau = lax.ppermute(chunk_tau, axis, perm)
                chunk_s = lax.ppermute(chunk_s, axis, perm)
                return (chunk_tau, chunk_s, ks, dtau), None

            ks0 = jnp.zeros((n_local, s_local.shape[1]), pol.dtype)
            (_, _, ks, dtau), _ = lax.scan(
                ring_step,
                (
                    lax.stop_gradient(tau_rows),
                    s_local,
                    ks0,
                    jnp.zeros_like(tau_rows),
                ),
                None,
                length=ndev,
            )
            (grad_k,) = vjp_tau(dtau)
            return ks, grad_k

        def triangle_terms(pol, trajs, offsets, s_local):
            """Balanced upper-triangle block Gram (the sharded default).

            The Gram is symmetric, and the single-chip solve exploits that
            (upper-triangle pairs only) — a full-row-block sharding
            therefore does 2x the single-chip PDE work and caps scaling
            efficiency at 0.5. Here the triangle's pair work is split into
            g(g+1)/2 equal blocks over ``g = 2·ndev`` row groups, assigned
            round-robin: per-device work ≈ ceil(g(g+1)/2/ndev)·(N/g)² pairs
            — within ~6% of the ideal N²/(2·ndev) at ndev ≥ 4. Each block
            (a, b) is ONE PDE solve whose value feeds the K@s row-sums of
            BOTH groups (k @ s_b and kᵀ @ s_a) and whose two-argument vjp
            yields both groups' repulsion cotangents; contributions
            accumulate into full-size buffers, one psum reduces them, and
            each device pulls its own rows back through its local rollout
            vjp."""

            def tau_of(pm):
                acts = pm if offsets is None else pm[None] + offsets
                _, tr = ctrl._rollout_costs(state, acts, params_mat)
                return ctrl._tau(tr)

            tau_rows, vjp_tau = jax.vjp(tau_of, pol)
            tau_all = lax.stop_gradient(
                lax.all_gather(tau_rows, axis, tiled=True)
            )
            s_all = lax.all_gather(s_local, axis, tiled=True)
            sig = sig_with_bw(tau_all)

            from ..kernels.pallas_sigkernel_block import (
                block_supported, block_tile_shard, block_tiles_ks_partial,
            )
            from ..kernels.pallas_sigkernel_block3 import (
                block3_supported, block3_tiles_ks_partial,
            )

            Lt, Ct = tau_all.shape[1], tau_all.shape[2]
            if (
                sig.dyadic_order == 3
                and sig.static == "rbf"
                and sig.bandwidth is not None
                and sig.grad_precision == "fp32"
                and sig._solver_kind(Lt - 1, Lt - 1) == "pallas"
                and block3_supported(n_total, Lt, Ct, "rbf", True)
            ):
                # dyadic-3 block-tile shards (r5): each device runs its tile
                # subset of the SAME fused band kernels the single chip
                # uses, instead of the unfused dense-block scan (measured
                # 1.2x faster per device — results/scaling_r5.json)
                hh = jnp.asarray(sig.bandwidth, tau_all.dtype)
                tI, tJ, tS, tW = block_tile_shard(n_total, ndev)
                di = lax.axis_index(axis)
                ks_p, dXp = block3_tiles_ks_partial(
                    tau_all, hh, s_all,
                    jnp.asarray(tI)[di], jnp.asarray(tJ)[di],
                    jnp.asarray(tS)[di], jnp.asarray(tW)[di],
                )
                ks_p = lax.psum(ks_p, axis)
                dXp = lax.psum(dXp, axis)
                ks = lax.dynamic_slice_in_dim(ks_p, row0, n_local, 0)
                dtau = 0.5 * lax.dynamic_slice_in_dim(dXp, row0, n_local, 0)
                (grad_k,) = vjp_tau(dtau)
                return ks, grad_k
            if (
                sig.dyadic_order == 0
                and sig.static == "rbf"
                and sig.bandwidth is not None
                and block_supported(n_total, Lt, Ct, "rbf", True)
            ):
                # λ=0 fast path (r5): shard the block kernel's TILE schedule
                # over the mesh instead of group-pair PDE blocks — each
                # device runs its tile subset of the same fused kernel the
                # single-chip solve uses (identical per-pair cost), K@s is
                # formed per tile (the Gram never materializes), and one
                # psum pair reduces the partial ks / pull-back sums.
                # Without this the sharded λ=0 Gram pays the pair-list
                # route's gather/scatter layer that the block kernel exists
                # to remove (results/lambda0_profile_r5.json).
                hh = jnp.asarray(sig.bandwidth, tau_all.dtype)
                tI, tJ, tS, tW = block_tile_shard(n_total, ndev)
                di = lax.axis_index(axis)
                ks_p, dXp = block_tiles_ks_partial(
                    tau_all, hh, s_all,
                    jnp.asarray(tI)[di], jnp.asarray(tJ)[di],
                    jnp.asarray(tS)[di], jnp.asarray(tW)[di],
                )
                ks_p = lax.psum(ks_p, axis)
                dXp = lax.psum(dXp, axis)
                ks = lax.dynamic_slice_in_dim(ks_p, row0, n_local, 0)
                dtau = 0.5 * lax.dynamic_slice_in_dim(dXp, row0, n_local, 0)
                (grad_k,) = vjp_tau(dtau)
                return ks, grad_k

            g = _triangle_groups(n_total, ndev)
            ng = n_total // g
            blocks = [(a, b) for a in range(g) for b in range(a, g)]
            per_dev = [[] for _ in range(ndev)]
            for i, blk in enumerate(blocks):
                per_dev[i % ndev].append(blk + (1.0,))
            maxb = max(len(lst) for lst in per_dev)
            for lst in per_dev:
                while len(lst) < maxb:
                    lst.append((0, 0, 0.0))  # dummy block, zero weight
            A = jnp.asarray([[e[0] for e in lst] for lst in per_dev])
            B = jnp.asarray([[e[1] for e in lst] for lst in per_dev])
            W = jnp.asarray(
                [[e[2] for e in lst] for lst in per_dev], pol.dtype
            )
            di = lax.axis_index(axis)

            def acc_add(acc, i0, delta):
                cur = lax.dynamic_slice_in_dim(acc, i0, ng, 0)
                return lax.dynamic_update_slice_in_dim(acc, cur + delta, i0, 0)

            def block_step(carry, abw):
                ks_acc, dtau_acc = carry
                ai, bi, w = abw
                a = ai * ng
                b = bi * ng
                wb = w * (a != b)  # diagonal blocks contribute once
                ta = lax.dynamic_slice_in_dim(tau_all, a, ng, 0)
                tb = lax.dynamic_slice_in_dim(tau_all, b, ng, 0)
                sa = lax.dynamic_slice_in_dim(s_all, a, ng, 0)
                sb = lax.dynamic_slice_in_dim(s_all, b, ng, 0)
                k_blk, vjp_blk = jax.vjp(sig.gram, ta, tb)
                da, db = vjp_blk(jnp.ones_like(k_blk))
                ks_acc = acc_add(ks_acc, a, w * (k_blk @ sb))
                ks_acc = acc_add(ks_acc, b, wb * (k_blk.T @ sa))
                dtau_acc = acc_add(dtau_acc, a, w * da)
                dtau_acc = acc_add(dtau_acc, b, wb * db)
                return (ks_acc, dtau_acc), None

            # scan, not a Python loop: at the flagship granularity a device
            # owns ~68 uniform blocks — unrolling them would explode compile
            # time without changing the generated per-block program
            (ks_acc, dtau_acc), _ = lax.scan(
                block_step,
                (jnp.zeros_like(s_all), jnp.zeros_like(tau_all)),
                (A[di], B[di], W[di]),
            )
            ks_acc = lax.psum(ks_acc, axis)
            dtau_acc = lax.psum(dtau_acc, axis)
            ks = lax.dynamic_slice_in_dim(ks_acc, row0, n_local, 0)
            dtau = lax.dynamic_slice_in_dim(dtau_acc, row0, n_local, 0)
            (grad_k,) = vjp_tau(dtau)
            return ks, grad_k

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

            if gram_mode in ("ring", "triangle") and ctrl.kernel_mode == "signature":
                # velocity assembled inline: ring_terms fuses the K @ s
                # row-sum with the chunk rotation, so there is no gathered
                # score matrix for _velocity_local to consume
                s_full = grad_pri + grad_lik
                if local_sampler.log_prior is not None:
                    s_full = s_full + jax.grad(
                        lambda xx: jnp.sum(local_sampler.log_prior(xx))
                    )(pol)
                sf = s_full.reshape(n_local, -1)
                terms = ring_terms if gram_mode == "ring" else triangle_terms
                ks, grad_kp = terms(pol, trajs, offsets, sf)
                gk = grad_kp.reshape(n_local, -1)
                if local_sampler.repulsion_schedule is not None:
                    gk = gk * local_sampler.repulsion_schedule(
                        jnp.zeros((), jnp.int32)
                    )
                phi = ((ks - gk) / n_total).reshape(pol.shape)
                if local_sampler.gradient_mask is not None:
                    phi = phi * local_sampler.gradient_mask
            else:
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
    gram_mode: str = "auto",
):
    """Jitted closed-loop step: sharded solve + environment transition."""

    @jax.jit
    def step(state, cstate, key):
        a_seq, cstate = sharded_dust_forward(
            ctrl, state, cstate, key, opt_steps, mesh, axis, col_axis,
            params_dist, gram_mode,
        )
        nxt = ctrl.model.step(state[None], a_seq[0:1])[0]
        return nxt, cstate, a_seq

    return step
