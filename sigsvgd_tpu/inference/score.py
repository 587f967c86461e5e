"""Score estimators: bridge cost functions to SVGD score dicts.

Counterpart of reference ``src/inference/score.py:6-76`` and the planning
script's estimators (``examples/script_planning_robot.py:39-115``): the target
density is ``p(x) ∝ exp(-cost(x))`` so ``∇log p = -∇cost``; kernel terms are
attached per kernel family (identity kernel = plain SGD).
"""
from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..kernels import PathSigKernel, SignatureKernel
from .svgd import ScoreFn, ScoreResult

CostFn = Callable[[jax.Array], Tuple[jax.Array, Any]]  # x -> (cost [n], aux)


def _grad_neg_cost(cost_fn: CostFn, x: jax.Array):
    def total(xx):
        cost, aux = cost_fn(xx)
        return jnp.sum(cost), (cost, aux)

    (_, (cost, aux)), g = jax.value_and_grad(total, has_aux=True)(x)
    return cost, aux, -g


def sgd_score(cost_fn: CostFn) -> ScoreFn:
    """Pure gradient descent disguised as SVGD: identity Gram, zero repulsion
    (reference ``score.py:28-35``)."""

    def score(x, key):
        cost, aux, grad_log_p = _grad_neg_cost(cost_fn, x)
        n = x.shape[0]
        return ScoreResult(
            grad_log_p=grad_log_p,
            k_xx=jnp.eye(n, dtype=x.dtype),
            grad_k=jnp.zeros_like(x),
            loss=cost,
            aux=aux,
        )

    return score


def svgd_score(cost_fn: CostFn, kernel) -> ScoreFn:
    """Analytic-kernel score (reference ``score.py:37-48``); kernel terms are
    left to the sampler (which applies its own repulsion schedule)."""

    def score(x, key):
        cost, aux, grad_log_p = _grad_neg_cost(cost_fn, x)
        k_xx, grad_k = kernel(x.reshape(x.shape[0], -1), x.reshape(x.shape[0], -1))
        return ScoreResult(
            grad_log_p=grad_log_p, k_xx=k_xx, grad_k=grad_k.reshape(x.shape) if grad_k.shape != x.shape else grad_k, loss=cost, aux=aux
        )

    return score


def pathsig_score(cost_fn: CostFn, kernel: SignatureKernel | PathSigKernel) -> ScoreFn:
    """Signature-kernel score for knot/trajectory particles ``[n, L, C]``
    (reference ``score.py:64-76``): Gram on the paths, repulsion gradient via
    AD through the PDE/signature solve with the second argument detached."""

    def score(x, key):
        cost, aux, grad_log_p = _grad_neg_cost(cost_fn, x)
        if isinstance(kernel, SignatureKernel):
            k_xx, grad_k = kernel.gram_and_grad(x)
        else:
            k_xx, grad_k = kernel(x, lax.stop_gradient(x))
        return ScoreResult(
            grad_log_p=grad_log_p, k_xx=k_xx, grad_k=grad_k, loss=cost, aux=aux
        )

    return score
