"""Pallas TPU kernel for the MXU block-propagator PDE chain (dyadic ≥ 6).

The XLA block-propagator (``sigkernel.solve_goursat_pde_mxu``) runs each
64-wide block hop as a pair-batched matmul; at the planning shape
(5-knot paths → 2×2 blocks, ``script_planning_robot.py:512-520``) its
forward+backward is ~3.7× the forward because JAX AD materializes the
``[B, D+1, 2m+1]`` hop temporaries and ``jax.checkpoint`` rematerialises
the whole forward chain, all through HBM. This kernel keeps the ENTIRE hop
chain VMEM-resident per 512-pair tile:

  * layout: nodes on sublanes, pairs on lanes — each hop is one
    ``[R, 128] × [128, P]`` MXU dot against the degree-stacked basis matrix
    ``Mstack[d·Fp+f, e] = M_d[f, e]`` (``R = (D+1)·Fp``, ``Fp = 2m+8`` so
    every degree slice is sublane-aligned), followed by the degree
    contraction ``out[f] = Σ_d z^d · U[d·Fp+f]`` on the VPU. The last input
    node (``e = 2m``) folds in as a rank-1 VPU update so the MXU contraction
    dimension stays exactly 128 (a 129-wide contraction would pad to 256 —
    2× wasted passes);
  * the 65-node north row and 64-node east column of each hop's output live
    CONTIGUOUSLY in one ``[Fp, P]`` buffer, so the next hop's input is a
    single sublane-mask select between the row buffer (rows ≤ m, from the
    hop below in the same block column) and the west carry (rows > m, from
    the previous hop in the same block row) — no unaligned concatenation;
  * custom VJP: the backward kernel recomputes the forward chain in VMEM
    (storing only the per-hop 136-row inputs), then sweeps the hops in
    reverse — ``d_zp`` via per-degree sublane reductions of the recomputed
    ``U`` against the output cotangent, ``d_in`` via ONE dot of the
    pre-transposed basis against the z-weighted cotangent stack. Nothing
    touches HBM except ``z`` (read twice) and ``dz`` (written once): there
    are NO residuals.

Precision: bf16 MXU inputs with float32 accumulation — equivalent to the
XLA path's ``mxu_precision="default"`` (~2e-3 Gram error; planning outcomes
measured IDENTICAL to 3-pass fp32 on the flagship scenes, see
``PlannerConfig.mxu_precision``). Tests pin the XLA "highest" path as the
oracle and check this kernel against it at the bf16 tolerance.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_M = 64            # block edge (fine cells); fixed so the contraction is 128
_NB = 2 * _M + 1   # nodes per hop input/output vector
_FP = _NB + 7      # sublane-aligned slice height (136 = 17×8)
_P = 128           # pairs per program (lane dimension)


def chain_supported(lx1: int, ly1: int, dyadic_order: int) -> bool:
    """The chain kernel handles dyadic orders whose refinement is a multiple
    of the fixed 64-wide block (λ ≥ 6) with a small unrolled hop count; the
    VMEM working set is ~2.5 MB + 68 KB per hop."""
    if dyadic_order < 6:
        return False
    sub = (1 << dyadic_order) // _M
    return (lx1 * sub) * (ly1 * sub) <= 16


@lru_cache(maxsize=4)
def _stacked_polys(degree: int):
    """``(Mstack [R, 128] bf16, MstackT [128, R] bf16, Mlast [R, 128] f32)``
    from the cached propagator basis: rows ``d·Fp + f`` hold ``M_d[f, :128]``
    (zero rows between slices); ``Mlast`` is ``M_d[f, 2m]`` broadcast across
    lanes for the rank-1 last-node update."""
    from .sigkernel import _propagator_polys

    Md = _propagator_polys(_M, degree)  # [D+1, NB, NB] float32 numpy
    R = (degree + 1) * _FP
    mstack = np.zeros((R, 128), np.float32)
    mlast = np.zeros((R, 1), np.float32)
    for d in range(degree + 1):
        mstack[d * _FP : d * _FP + _NB] = Md[d, :, :128]
        mlast[d * _FP : d * _FP + _NB] = Md[d, :, 128][:, None]
    # numpy, NOT jnp: jnp constants created inside a trace leak tracers
    # out of the lru_cache; call sites asarray them (free constant folding)
    return mstack, np.ascontiguousarray(mstack.T), mlast


def _hop_u(mm_ref, ml_ref, inp):
    """Degree-stacked block products ``U[d·Fp+f] = (M_d @ inp)[f]`` for one
    [P]-pair tile: inp [Fp, P] f32 → U [R, P] f32."""
    u = lax.dot_general(
        mm_ref[:],
        inp[:128].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return u + ml_ref[:] * inp[128:129]


def _degree_sum(u, zrow, degree):
    """``out[f] = Σ_d z^d U[d·Fp+f]`` — the VPU degree contraction."""
    out = u[:_FP]
    zp = zrow
    for d in range(1, degree + 1):
        out = out + zp * u[d * _FP : (d + 1) * _FP]
        zp = zp * zrow
    return out


def _fwd_kernel(nbx, nby, sub, ly1, degree, z_ref, mm_ref, ml_ref, k_ref,
                buf_ref):
    """Grid (nt,): full hop chain for one 128-pair tile.

    z_ref [1, nc, 1, P] (nc = lx1·ly1 coarse cells, row-major) ·
    mm [R, 128] bf16 · ml [R, 1] f32 · k_ref [1, 1, P] ·
    buf_ref VMEM [nbx, Fp, P].
    """
    rows = lax.broadcasted_iota(jnp.int32, (_FP, _P), 0)
    north = rows <= _M
    ones = jnp.ones((_FP, _P), jnp.float32)
    for i in range(nbx):
        buf_ref[i] = ones
    for J in range(nby):
        west = ones
        for I in range(nbx):
            inp = jnp.where(north, buf_ref[I], west)
            cidx = (I // sub) * ly1 + (J // sub)
            out = _degree_sum(_hop_u(mm_ref, ml_ref, inp), z_ref[0, cidx],
                              degree)
            buf_ref[I] = out
            west = out
    k_ref[0] = buf_ref[nbx - 1, pl.ds(_M, 1)]


def _bwd_kernel(nbx, nby, sub, ly1, degree, z_ref, mm_ref, mmt_ref, ml_ref,
                gout_ref, dz_ref, buf_ref, inph_ref, dbuf_ref):
    """Grid (nt,): recompute the chain in VMEM, then reverse it.

    inph_ref [nbx·nby, Fp, P] holds each hop's input; the reverse sweep
    rebuilds ``U`` with one dot, reduces ``d_zp`` per degree slice, and
    pulls the input cotangent back with one dot against ``mmt``.
    """
    rows = lax.broadcasted_iota(jnp.int32, (_FP, _P), 0)
    north = rows <= _M
    ones = jnp.ones((_FP, _P), jnp.float32)
    zeros = jnp.zeros((_FP, _P), jnp.float32)

    for c in range(z_ref.shape[1]):
        dz_ref[0, c] = jnp.zeros_like(dz_ref[0, c])

    # ---- forward chain, storing hop inputs --------------------------------
    for i in range(nbx):
        buf_ref[i] = ones
    for J in range(nby):
        west = ones
        for I in range(nbx):
            inp = jnp.where(north, buf_ref[I], west)
            inph_ref[J * nbx + I] = inp
            cidx = (I // sub) * ly1 + (J // sub)
            out = _degree_sum(_hop_u(mm_ref, ml_ref, inp), z_ref[0, cidx],
                              degree)
            buf_ref[I] = out
            west = out

    # ---- reverse sweep ----------------------------------------------------
    # seed: the solve's value is row m of the final hop's north output
    seed = jnp.where(rows == _M, jnp.broadcast_to(gout_ref[0], (_FP, _P)), 0.0)
    for i in range(nbx - 1):
        dbuf_ref[i] = zeros
    dbuf_ref[nbx - 1] = seed
    for J in range(nby - 1, -1, -1):
        d_west = zeros
        for I in range(nbx - 1, -1, -1):
            # north rows (≤ m) of hop (I,J)'s output feed hop (I, J+1) —
            # their cotangent sits in dbuf[I]; east rows feed hop (I+1, J) —
            # theirs is the west carry. Rows > m of dbuf[I] are that
            # buffer's own west-cotangent junk and are masked off here.
            d_out = jnp.where(north, dbuf_ref[I], d_west)
            inp = inph_ref[J * nbx + I]
            u = _hop_u(mm_ref, ml_ref, inp)
            cidx = (I // sub) * ly1 + (J // sub)
            zrow = z_ref[0, cidx]
            # w = degree-stacked z-weighted cotangent d_U; d_zp reductions
            # interleave with its construction. zp holds z^{d-1} when the
            # d-th term is formed, so d·z^{d-1}·d_zp accumulates without a
            # pow (pow's VJP at z == 0 would be NaN; repeated multiply is
            # exact and safe).
            w_slices = [d_out]
            dz_acc = jnp.zeros((1, _P), jnp.float32)
            zp = jnp.ones((1, _P), jnp.float32)
            for d in range(1, degree + 1):
                dzp = jnp.sum(
                    u[d * _FP : (d + 1) * _FP] * d_out, axis=0, keepdims=True
                )
                dz_acc = dz_acc + float(d) * zp * dzp
                zp = zp * zrow
                w_slices.append(zp * d_out)
            dz_ref[0, cidx] = dz_ref[0, cidx] + dz_acc
            w = jnp.concatenate(w_slices, axis=0)  # [R, P]
            d_main = lax.dot_general(
                mmt_ref[:],
                w.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [128, P]
            d_last = jnp.sum(ml_ref[:] * w, axis=0, keepdims=True)  # [1, P]
            # aligned stores: rows 0..127, then one [8, P] tail slab
            dbuf_ref[I, pl.ds(0, 128)] = d_main
            dbuf_ref[I, pl.ds(128, 8)] = jnp.concatenate(
                [d_last, jnp.zeros((7, _P), jnp.float32)], axis=0
            )
            d_west = dbuf_ref[I]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _grid_params():
    return pltpu.CompilerParams(
        dimension_semantics=(pltpu.GridDimensionSemantics.PARALLEL,)
    )


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _chain_tiled(z, nbx, nby, sub, degree):
    """Hop-chain solve on tiled scaled increments ``z [nt, nc, 1, P]`` →
    ``k [nt, 1, P]``; the custom-VJP boundary lives on the tile layout."""
    nt, nc = z.shape[0], z.shape[1]
    ly1 = nc // (nbx // sub)
    mm_np, _, ml_np = _stacked_polys(degree)
    mm = jnp.asarray(mm_np, jnp.bfloat16)
    ml = jnp.asarray(ml_np)
    R = mm.shape[0]
    kern = partial(_fwd_kernel, nbx, nby, sub, ly1, degree)
    return pl.pallas_call(
        kern,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, nc, 1, _P), lambda p: (p, 0, 0, 0)),
            pl.BlockSpec((R, 128), lambda p: (0, 0)),
            pl.BlockSpec((R, 1), lambda p: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, _P), lambda p: (p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nt, 1, _P), z.dtype),
        scratch_shapes=[pltpu.VMEM((nbx, _FP, _P), z.dtype)],
        compiler_params=_grid_params(),
        interpret=_interpret(),
    )(z, mm, ml)


def _chain_fwd(z, nbx, nby, sub, degree):
    return _chain_tiled(z, nbx, nby, sub, degree), z


def _chain_bwd(nbx, nby, sub, degree, z, g_out):
    nt, nc = z.shape[0], z.shape[1]
    ly1 = nc // (nbx // sub)
    mm_np, mmt_np, ml_np = _stacked_polys(degree)
    mm = jnp.asarray(mm_np, jnp.bfloat16)
    mmt = jnp.asarray(mmt_np, jnp.bfloat16)
    ml = jnp.asarray(ml_np)
    R = mm.shape[0]
    kern = partial(_bwd_kernel, nbx, nby, sub, ly1, degree)
    dz = pl.pallas_call(
        kern,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, nc, 1, _P), lambda p: (p, 0, 0, 0)),
            pl.BlockSpec((R, 128), lambda p: (0, 0)),
            pl.BlockSpec((128, R), lambda p: (0, 0)),
            pl.BlockSpec((R, 1), lambda p: (0, 0)),
            pl.BlockSpec((1, 1, _P), lambda p: (p, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, nc, 1, _P), lambda p: (p, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nt, nc, 1, _P), z.dtype),
        scratch_shapes=[
            pltpu.VMEM((nbx, _FP, _P), z.dtype),
            pltpu.VMEM((nbx * nby, _FP, _P), z.dtype),
            pltpu.VMEM((nbx, _FP, _P), z.dtype),
        ],
        compiler_params=_grid_params(),
        interpret=_interpret(),
    )(z, mm, mmt, ml, g_out)
    return (dz,)


_chain_tiled.defvjp(_chain_fwd, _chain_bwd)


def solve_goursat_pde_mxu_pallas(
    inc: jax.Array, dyadic_order: int, degree: int = 10
) -> jax.Array:
    """Drop-in for :func:`sigkernel.solve_goursat_pde_mxu` at dyadic ≥ 6
    with bf16-MXU ("default"-grade) precision and a VMEM-resident custom
    adjoint. ``inc [B, lx1, ly1]`` → ``[B]``. Runs in interpret mode
    off-TPU so CPU tests exercise the same code."""
    b, lx1, ly1 = inc.shape
    if not chain_supported(lx1, ly1, dyadic_order):
        raise ValueError(
            "pallas hop-chain solver needs dyadic_order >= 6 and at most 16 "
            f"64-wide block hops; got paths of {lx1+1}x{ly1+1} nodes at "
            f"dyadic_order={dyadic_order}"
        )
    sub = (1 << dyadic_order) // _M
    nbx, nby = lx1 * sub, ly1 * sub
    nc = lx1 * ly1
    nt = -(-b // _P)
    pad = nt * _P - b
    zf = (inc / float(4**dyadic_order)).reshape(b, nc)
    if pad:
        zf = jnp.concatenate([zf, jnp.zeros((pad, nc), zf.dtype)])
    # tile layout: [nt, nc, 1, P] with the pair axis minor
    zt = jnp.transpose(zf.reshape(nt, _P, nc), (0, 2, 1))[:, :, None, :]
    k = _chain_tiled(zt, nbx, nby, sub, degree)
    return k.reshape(-1)[:b]
