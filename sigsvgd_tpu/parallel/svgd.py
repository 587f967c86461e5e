"""Sharded SVGD: particles distributed over a mesh axis, XLA collectives on ICI.

The SVGD velocity ``φ = (K s − ∇K)/N`` is a row-sharded matmul: each device
owns a block of particles, ``all_gather``s the (much smaller) particle/score
tensors, computes its ``[n_local, N]`` Gram rows + its own aggregated kernel
gradients, and applies local optimizer updates. Cost/score evaluation
(rollouts, FK, collision nets) is embarrassingly parallel over the local
block — the expensive part never moves over the interconnect.

Sharded score functions return LOCAL ROWS: ``grad_log_p [n_local, ...]``,
optional ``k_xx [n_local, N]`` (Gram rows) and ``grad_k [n_local, ...]``.

This layer is new relative to the reference, which has no distributed
communication at all (SURVEY.md §5.8): its multi-GPU story is one process per
scene with zero inter-process communication.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..inference.svgd import SVGD, RunData, ScoreResult
from ..kernels import SignatureKernel


def _axes(axis) -> tuple:
    return tuple(axis) if isinstance(axis, (tuple, list)) else (axis,)


def distributed_median(vals_local: jax.Array, axis, iters: int = 40) -> jax.Array:
    """Exact median of values sharded over ``axis`` (one mesh-axis name or a
    tuple for 2-D pair-grid shards).

    Bisection on the value range with psum'd rank counts — ~``iters`` scalar
    all-reduces instead of gathering the full tensor — then a SNAP to the
    smallest element strictly above the bisection's lower bound, which by the
    loop invariant ``count(≤lo) ≤ k < count(≤hi)`` is exactly the kth order
    statistic once the interval has collapsed. Returns the LOWER of the two
    middle order statistics for even counts — ``torch.median``'s convention,
    matching ``utils.math.bw_median``.
    """
    ax = _axes(axis)
    v = vals_local.reshape(-1)
    n_total = lax.psum(v.shape[0], ax)
    k = (n_total - 1) // 2  # 0-indexed lower-middle order statistic

    # lo starts strictly below the minimum so the invariant count(≤lo) ≤ k
    # holds from the first step (an all-equal tensor would otherwise never
    # move the bounds)
    lo = lax.pmin(jnp.min(v), ax) - 1.0
    hi = lax.pmax(jnp.max(v), ax)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        cnt = lax.psum(jnp.sum(v <= mid), ax)
        go_down = cnt >= k + 1  # kth order stat lies at or below mid
        return jnp.where(go_down, lo, mid), jnp.where(go_down, mid, hi)

    lo, _hi = lax.fori_loop(0, iters, body, (lo, hi))
    inf = jnp.asarray(jnp.inf, v.dtype)
    cand = jnp.min(jnp.where(v > lo, v, inf))
    return lax.pmin(cand, ax)


def distributed_median_diff(vals_local: jax.Array, axis,
                            iters: int = 40) -> jax.Array:
    """Differentiable sharded median: :func:`distributed_median` provides the
    VALUE; the gradient is routed through one owning element (re-selected by
    value; lowest mesh position wins cross-shard ties) — matching the
    single-device ``jnp.partition``-median, whose gradient flows to the
    selected element (``utils.math.bw_median`` under ``value_and_grad``, as
    the reference's trajectory kernel differentiates through its bandwidth).
    """
    ax = _axes(axis)
    v = vals_local.reshape(-1)
    vs = lax.stop_gradient(v)
    med = distributed_median(vs, axis, iters)
    has = jnp.any(vs == med)
    pos = jnp.zeros((), jnp.int32)
    for a in ax:
        pos = pos * lax.psum(1, a) + lax.axis_index(a)
    ndev_total = lax.psum(1, ax)
    owner = lax.pmin(jnp.where(has, pos, ndev_total), ax)
    idx = jnp.argmax(vs == med)  # first local match
    sel = jnp.where(pos == owner, v[idx], jnp.zeros((), v.dtype))
    return lax.psum(sel, ax)


def _velocity_local(
    svgd: SVGD,
    x_local: jax.Array,
    score: ScoreResult,
    step: jax.Array,
    axis: str,
    col_axis: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Stein velocity for the local particle block (runs inside shard_map).

    With ``col_axis`` (2-D pair-grid sharding), each device owns a
    ``[n_local, N/sp]`` *block* of the Gram: rows follow the particle shard
    (``axis``='dp'), columns the ``col_axis``='sp' split; the row-sum
    ``K @ s`` and the aggregated kernel gradient are ``psum``'d over 'sp' —
    the 2-D sharded-matmul pattern of the scaling playbook.
    """
    n_local = x_local.shape[0]
    xf = x_local.reshape(n_local, -1)
    s = score.grad_log_p.reshape(n_local, -1)
    if svgd.log_prior is not None:
        prior_grad = jax.grad(lambda xx: jnp.sum(svgd.log_prior(xx)))(x_local)
        s = s + prior_grad.reshape(n_local, -1)
    s_all = lax.all_gather(s, axis, tiled=True)  # [N, D]
    n_total = s_all.shape[0]

    if col_axis is not None:
        sp = lax.psum(1, col_axis)
        assert n_total % sp == 0, (n_total, sp)  # else remainder cols dropped
        cols = n_total // sp
        col0 = lax.axis_index(col_axis) * cols
        s_cols = lax.dynamic_slice_in_dim(s_all, col0, cols, axis=0)
    else:
        s_cols = s_all

    if score.k_xx is not None and score.grad_k is not None:
        k_rows = score.k_xx  # [n_local, N] or [n_local, N/sp] column block
        grad_k = score.grad_k.reshape(n_local, -1)
    else:
        x_all = lax.all_gather(xf, axis, tiled=True)  # [N, D]
        if col_axis is not None:
            x_cols = lax.dynamic_slice_in_dim(x_all, col0, cols, axis=0)
        else:
            x_cols = x_all
        from ..utils.math import pw_dist_sq

        d2 = pw_dist_sq(xf, x_cols)
        if svgd.kernel.bandwidth_fn is not None:
            h = svgd.kernel.bandwidth_fn(d2)
        else:
            # exact median-heuristic bandwidth over the *global* d² matrix —
            # every shard must agree for the Gram to be consistent
            med = distributed_median(
                d2, axis if col_axis is None else (axis, col_axis)
            )
            h = jnp.maximum(
                svgd.kernel.bw_scale * jnp.sqrt(med / jnp.log(n_total + 1.0)),
                1e-8,
            )
        k_rows, grad_k = svgd.kernel(xf, x_cols, h=h)

    ks = k_rows @ s_cols
    if col_axis is not None:
        ks = lax.psum(ks, col_axis)
        grad_k = lax.psum(grad_k, col_axis)

    if svgd.repulsion_schedule is not None:
        grad_k = grad_k * svgd.repulsion_schedule(step)

    phi = (ks - grad_k) / n_total
    phi = phi.reshape(x_local.shape)
    if svgd.gradient_mask is not None:
        phi = phi * svgd.gradient_mask  # caller passes the local mask block
    loss = score.loss if score.loss is not None else jnp.linalg.norm(s)
    return phi, loss


def sharded_svgd_run(
    svgd: SVGD,
    particles: jax.Array,
    score_fn: Callable[[jax.Array, jax.Array], ScoreResult],
    n_steps: int,
    mesh: Mesh,
    key: Optional[jax.Array] = None,
    axis: str = "dp",
    col_axis: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Run ``n_steps`` of SVGD with particles sharded over ``mesh[axis]``.

    ``score_fn(x_local, key) -> ScoreResult`` is evaluated per shard and may
    itself use collectives (see :func:`sharded_pathsig_score`). With
    ``col_axis`` the Gram's column dimension is additionally split over a
    second mesh axis (2-D dp×sp pair-grid sharding; particles are replicated
    over 'sp' and the velocity is psum-reduced). Returns
    ``(final_particles, per-step losses)``; identical (up to fp reordering) to
    the single-device :meth:`SVGD.run` — asserted in tests/test_parallel.py.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    n = particles.shape[0]
    ndev = mesh.shape[axis]
    assert n % ndev == 0, f"particles ({n}) must divide mesh axis ({ndev})"
    if col_axis is not None:
        assert n % mesh.shape[col_axis] == 0
    keys = jax.random.split(key, n_steps)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(axis), P()),
        check_vma=False,
    )
    def run_local(x_local, keys):
        state = svgd.init(x_local)

        def body(carry, step_key):
            x, st = carry
            score = score_fn(x, step_key)
            phi, loss = _velocity_local(svgd, x, score, st.step, axis, col_axis)
            x_new, opt_state = svgd.apply_update(x, -phi, st.opt_state)
            from ..inference.svgd import SVGDState

            # one global scalar loss per step (psum over shards)
            loss_scalar = lax.psum(jnp.sum(jnp.atleast_1d(loss)), axis)
            return (x_new, SVGDState(opt_state, st.step + 1)), loss_scalar

        (x_final, _), losses = lax.scan(body, (x_local, state), keys)
        return x_final, losses

    x_final, losses = run_local(particles, keys)
    return x_final, losses


def sharded_pathsig_score(
    cost_fn: Callable,
    sig_kernel: SignatureKernel,
    axis: str = "dp",
    paths_of: Optional[Callable[[jax.Array], jax.Array]] = None,
    col_axis: Optional[str] = None,
):
    """Signature-kernel score with a row-sharded Gram.

    Each shard all_gathers the (small) path tensor, solves the Goursat PDE for
    its ``[n_local, N]`` block of pairs, and differentiates the block sum
    w.r.t. its local particles only — exactly the rows the sharded velocity
    needs. Communication: one all_gather of ``[N, L, C]`` paths per step.

    ``paths_of`` maps particles to the paths entering the kernel (default:
    particles are the paths, as in knot-space planning). With ``col_axis``
    the pair grid is 2-D sharded (rows=dp, cols=sp). The kernel must use a
    *fixed* static bandwidth — per-block median heuristics would disagree
    across shards.
    """
    assert sig_kernel.bandwidth is not None or sig_kernel.static == "linear", (
        "sharded signature score requires a fixed bandwidth"
    )
    paths_of = paths_of or (lambda x: x)

    def score(x_local, key):
        def total_cost(xl):
            c, aux = cost_fn(xl)
            return jnp.sum(c), (c, aux)

        (_, (cost, aux)), grad_c = jax.value_and_grad(total_cost, has_aux=True)(
            x_local
        )
        tau_local = paths_of(x_local)
        tau_all = lax.stop_gradient(
            lax.all_gather(tau_local, axis, tiled=True)
        )  # [N, L, C]
        if col_axis is not None:
            sp = lax.psum(1, col_axis)
            assert tau_all.shape[0] % sp == 0, (tau_all.shape, sp)
            cols = tau_all.shape[0] // sp
            col0 = lax.axis_index(col_axis) * cols
            tau_cols = lax.dynamic_slice_in_dim(tau_all, col0, cols, axis=0)
        else:
            tau_cols = tau_all

        def gram_sum(xl):
            k = sig_kernel.gram(paths_of(xl), tau_cols)
            return jnp.sum(k), k

        # one PDE solve shared between the Gram rows and their gradient
        (_, k_rows), grad_k = jax.value_and_grad(gram_sum, has_aux=True)(x_local)
        return ScoreResult(
            grad_log_p=-grad_c, k_xx=k_rows, grad_k=grad_k, loss=cost, aux=aux
        )

    return score
