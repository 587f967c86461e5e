"""Fused SVGD velocity as a Pallas TPU kernel.

Computes the whole Stein update for an RBF kernel in one pass over the
particle pair grid — pairwise distances, Gram, attraction ``K @ s`` and the
aggregated repulsion ``∇K`` never touch HBM:

    φ_i = ( Σ_j K_ij s_j − (Σ_j K_ij x_j − (Σ_j K_ij) x_i) / h² ) / N,
    K_ij = exp(−0.5 ||x_i − x_j||² / h²)

Tiling is flash-attention-shaped: the grid walks row blocks of particles;
each program streams column blocks out of VMEM, doing the three contractions
(``X_r @ X_cᵀ``, ``K @ s_c``, ``K @ x_c``) on the MXU and the exp on the VPU.
The velocity is consumed as a raw update direction (never differentiated), so
no VJP is needed.

The XLA matmul-form path (``kernels/rbf.py``) is already near-roofline at
small N; this kernel targets the large-N regime (≥2k particles per chip) and
serves as the fusion template. ``fused_rbf_velocity`` falls back to the XLA
path on non-TPU backends.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.math import bw_median, pw_dist_sq


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _velocity_kernel(
    h_ref,
    x_rows_ref,
    x_full_ref,
    s_full_ref,
    phi_ref,
    *,
    n_valid: int,
    block_c: int,
    high_precision: bool,
):
    """One row-block program: accumulate over column blocks of the pair grid."""
    h2 = h_ref[0, 0] * h_ref[0, 0]
    x_rows = x_rows_ref[...]  # [BN, Dp]
    bn, dp = x_rows.shape
    n_pad = x_full_ref.shape[0]
    num_c = n_pad // block_c

    rn = jnp.sum(x_rows * x_rows, axis=1, keepdims=True)  # [BN, 1]
    if high_precision:
        # hi/lo split: 3-pass cross-product recovers ~fp32 accuracy from the
        # bf16 MXU (the d² term is the precision-critical one; the K@s / K@x
        # contractions of k ∈ [0,1] are fine at native precision)
        xr_hi = x_rows.astype(jnp.bfloat16).astype(jnp.float32)
        xr_lo = x_rows - xr_hi

    def col_step(c, carry):
        ks, ky, rowsum = carry
        xc = x_full_ref[pl.ds(c * block_c, block_c), :]  # [BC, Dp]
        sc = s_full_ref[pl.ds(c * block_c, block_c), :]
        cn = jnp.sum(xc * xc, axis=1, keepdims=True)
        if high_precision:
            xc_hi = xc.astype(jnp.bfloat16).astype(jnp.float32)
            xc_lo = xc - xc_hi
            cross = (
                jnp.dot(xr_hi, xc_hi.T, preferred_element_type=jnp.float32)
                + jnp.dot(xr_hi, xc_lo.T, preferred_element_type=jnp.float32)
                + jnp.dot(xr_lo, xc_hi.T, preferred_element_type=jnp.float32)
            )
        else:
            cross = jnp.dot(x_rows, xc.T, preferred_element_type=jnp.float32)
        d2 = jnp.maximum(rn + cn.T - 2.0 * cross, 0.0)
        k = jnp.exp(-0.5 * d2 / h2)
        # padded columns must not contribute to any reduction
        col_ids = c * block_c + jax.lax.broadcasted_iota(
            jnp.int32, (bn, block_c), 1
        )
        k = jnp.where(col_ids < n_valid, k, 0.0)
        ks = ks + jnp.dot(k, sc, preferred_element_type=jnp.float32)
        ky = ky + jnp.dot(k, xc, preferred_element_type=jnp.float32)
        rowsum = rowsum + jnp.sum(k, axis=1, keepdims=True)
        return ks, ky, rowsum

    init = (
        jnp.zeros((bn, dp), jnp.float32),
        jnp.zeros((bn, dp), jnp.float32),
        jnp.zeros((bn, 1), jnp.float32),
    )
    ks, ky, rowsum = jax.lax.fori_loop(0, num_c, col_step, init)
    grad_k = (ky - rowsum * x_rows) / h2
    phi_ref[...] = (ks - grad_k) / float(n_valid)


@functools.partial(
    jax.jit, static_argnames=("block_n", "block_c", "interpret", "high_precision")
)
def fused_rbf_velocity_pallas(
    x: jax.Array,
    s: jax.Array,
    h: jax.Array,
    block_n: int = 256,
    block_c: int = 512,
    interpret: bool = False,
    high_precision: bool = True,
) -> jax.Array:
    """Fused φ for flattened particles ``x [N, D]``, scores ``s [N, D]``,
    bandwidth ``h`` (scalar). Returns ``φ [N, D]``."""
    n, d = x.shape
    dp = _round_up(d, 128)
    block_n = min(block_n, _round_up(n, 8))
    np_ = _round_up(n, max(block_n, block_c))
    # center the particles: φ is translation-invariant (distances, K@s, and
    # K@x − rowsum·x all unchanged) and smaller magnitudes cut the bf16 MXU
    # rounding error of the cross-products by ~an order of magnitude
    x = x - jnp.mean(x, axis=0, keepdims=True)
    xp = jnp.zeros((np_, dp), jnp.float32).at[:n, :d].set(x)
    sp = jnp.zeros((np_, dp), jnp.float32).at[:n, :d].set(s)
    h2d = jnp.reshape(h.astype(jnp.float32), (1, 1))

    bc = min(block_c, np_)
    kernel = functools.partial(
        _velocity_kernel, n_valid=n, block_c=bc, high_precision=high_precision
    )
    phi = pl.pallas_call(
        kernel,
        grid=(np_ // block_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # h
            pl.BlockSpec(
                (block_n, dp), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),  # row block
            pl.BlockSpec((np_, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_n, dp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((np_, dp), jnp.float32),
        interpret=interpret,
    )(h2d, xp, xp, sp)
    return phi[:n, :d]


def xla_rbf_velocity(x: jax.Array, s: jax.Array, h: jax.Array) -> jax.Array:
    """Reference XLA implementation (matmul form, identical math)."""
    n = x.shape[0]
    d2 = pw_dist_sq(x, x)
    k = jnp.exp(-0.5 * d2 / h**2)
    grad_k = (
        jnp.matmul(k, x, precision="highest")
        - jnp.sum(k, axis=1, keepdims=True) * x
    ) / h**2
    return (jnp.matmul(k, s, precision="highest") - grad_k) / n


def fused_rbf_velocity(
    x: jax.Array, s: jax.Array, h: jax.Array | None = None
) -> jax.Array:
    """Dispatching entry point: Pallas on TPU, XLA elsewhere; median-heuristic
    bandwidth when ``h`` is None (computed outside the kernel)."""
    if h is None:
        h = bw_median(pw_dist_sq(x, x))
    if jax.default_backend() in ("tpu", "axon"):
        return fused_rbf_velocity_pallas(x, s, jnp.asarray(h))
    return xla_rbf_velocity(x, s, jnp.asarray(h))
