"""Sharded MPF — the Stein particle filter's observe-update over a mesh.

The dynamics-parameter particles shard over the ``axis`` ('dp') mesh axis
(VERDICT r2 item 4: MPF rides the same row-sharded velocity as SVGD). Per
Stein step, each shard computes its particles' posterior score locally (the
likelihood rollout ``model.step`` and the analytic GMM-prior gradient are
per-particle), all_gathers the score/particle rows, and forms its
``[n_local, N]`` RBF Gram rows — the velocity ``(K s − ∇K)/N`` is the same
row-block matmul as :func:`sigsvgd_tpu.parallel.svgd._velocity_local`.

The kernel/prior bandwidth (Silverman or fixed) is computed once on the
replicated pre-update particles — exactly the single-device
:meth:`MPF.observe` flow (ref ``mpf.py:64-86``), so results match to fp
tolerance (tests/test_parallel_mpf.py).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..inference.mpf import MPF, MPFState
from ..utils.math import gmm_log_prob


def sharded_mpf_observe(
    mpf: MPF,
    state: MPFState,
    action: jax.Array,
    new_obs: jax.Array,
    mesh: Mesh,
    axis: str = "dp",
    n_steps: int = 20,
    bw: Optional[float] = None,
) -> Tuple[MPFState, jax.Array]:
    """Sharded counterpart of :meth:`MPF.observe`. The particle count must
    divide the mesh axis. Returns the (replicated) new filter state and the
    per-step global gradient norms."""
    n = state.particles.shape[0]
    assert n % mesh.shape[axis] == 0, (n, mesh.shape[axis])

    cond = mpf.likelihood.condition(action, new_obs, prev=state.cond)
    kern_bw = (
        jnp.asarray(bw * mpf.bw_scale, state.particles.dtype)
        if bw is not None
        else mpf._bandwidth(state.particles)
    )
    prior_w = jnp.ones((state.prior_means.shape[0],), state.particles.dtype)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P()),
        out_specs=(P(axis), P()),
        check_vma=False,
    )
    def run(x_local, prior_means, prior_var, cond_arrs):
        cond_in = type(cond)(*cond_arrs)
        n_local = x_local.shape[0]

        def log_post(theta):
            pred = mpf.likelihood.sample(theta, cond_in)
            log_lik = jnp.sum(mpf.likelihood.log_prob(pred, cond_in))
            log_pri = jnp.sum(
                gmm_log_prob(theta, prior_means, prior_var, prior_w)
            )
            return log_lik + log_pri

        def body(x, _):
            score = jax.grad(log_post)(x)
            xf = x.reshape(n_local, -1)
            s_all = lax.all_gather(
                score.reshape(n_local, -1), axis, tiled=True
            )
            x_all = lax.all_gather(xf, axis, tiled=True)
            n_total = x_all.shape[0]
            k_rows, grad_k = mpf.kernel(xf, x_all, h=kern_bw)
            phi = ((k_rows @ s_all - grad_k) / n_total).reshape(x.shape)
            gnorm = jnp.sqrt(lax.psum(jnp.sum(phi * phi), axis))
            return x + mpf.lr * phi, gnorm

        particles, grads = lax.scan(body, x_local, None, length=n_steps)
        return particles, grads

    particles, grads = run(
        state.particles,
        state.prior_means,
        state.prior_bw**2,
        tuple(state._replace(cond=cond).cond),
    )
    new_state = MPFState(
        particles=particles,
        prior_means=particles,
        prior_bw=kern_bw,
        cond=cond,
    )
    return new_state, grads
