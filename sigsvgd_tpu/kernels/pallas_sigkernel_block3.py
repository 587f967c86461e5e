"""Block-structured λ=3 fused signature-kernel Gram+gradient.

Round-5 follow-up to the λ=0 block kernel (``pallas_sigkernel_block.py``):
the same [16 row-particles × 128 col-particles] outer-product tile layout
applied to the dyadic-3 band-streamed kernels. The PDE sweeps are VERBATIM
the production fused kernels' (``_band_sweep`` forward, ``_bwd_rows_fast``
three-chain backward — imported, not copied); only the STATICS change: the
RBF rows are formed from block-resident paths (x row blocks broadcast over
lanes, the y block over sublanes) instead of 2048 gathered per-pair path
tiles. Gains over the pair-list route:

  * no per-pair gather/transpose layer and no scatter-add VJP — per-tile
    HBM path traffic is the [16, C] x-row blocks + one [L, C, 128] y block;
    the host side reduces per-pair-slot gradients (lane-sum → dX rows,
    sublane-sum → dY cols) and segment-adds over ~300 tiles;
  * the sharded triangle Gram can run THIS kernel per tile subset instead
    of the unfused dense-block route (measured 1.29-1.44 µs/pair vs the
    fused 1.095 — ``results/scaling_r5.json``).

Cotangent seeds (2 for strictly-upper tiles, 1 for block-diagonal, 0 for
padding) enter through the per-tile mask·seed array exactly where the
pair-list route's ``g_out`` cotangents do — the adjoint is linear in them.

Reference semantics: identical FD scheme/coefficients to the reference's
``sigkernel`` dependency at ``dyadic_order=3``
(``/root/reference/src/kernels/_traj_kernels.py:198-206``). Validated
against the pair-list fused route and the fp32 wavefront in
``tests/test_pallas_block3.py``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sigkernel import (
    _M,
    _NH,
    _S,
    _ZS,
    _band_sweep,
    _bands_per_ck,
    _bwd_rows_fast,
    _coef,
    _interpret,
    _n_ck_slots,
    _params,
    pallas_supported,
)
from .pallas_sigkernel_block import (
    _LB,
    _SB,
    _assemble_k,
    _cdiv,
    _mask_seed_blocks,
    _tile_lists,
)


def block3_supported(n: int, L: int, C: int, static: str, h) -> bool:
    """Symmetric-Gram shapes for the λ=3 block route: the band kernels'
    envelope (ly1 ≤ 48) plus the block layout's lane constraint."""
    return (
        static == "rbf"
        and h is not None
        and n >= 2
        and 1 <= C <= 8
        and L * C <= 128
        and pallas_supported(L - 1, L - 1, 3)
    )


# ---------------------------------------------------------------------------
# Block statics: RBF rows from resident x row-blocks and the y block.
# ---------------------------------------------------------------------------


def _yn_init_b(yb_ref, yn_ref, C: int):
    yn = yb_ref[0, :, 0, :] * yb_ref[0, :, 0, :]
    for c in range(1, C):
        yn = yn + yb_ref[0, :, c, :] * yb_ref[0, :, c, :]
    yn_ref[:] = jnp.broadcast_to(yn[:, None, :], yn_ref.shape)


def _g_row_b(xg_ref, yb_ref, yn_ref):
    """Static-Gram row for one x path point against all of y:
    ``xg_ref [1, 1, Sb, C]`` (this row's x, per row-particle sublane),
    ``yb_ref [1, L, C, 128]`` (resident, per col-particle lane) →
    ``(g, d2) [Ly, Sb, 128]``. Same convention as the pair-tile ``_g_row``
    (paths pre-scaled by rsqrt(h), d2 clamped at 0)."""
    C = xg_ref.shape[3]
    xc0 = xg_ref[0, 0, :, 0:1]                       # [Sb, 1]
    xn = xc0 * xc0
    cross = xc0[None] * yb_ref[0, :, 0, :][:, None, :]
    for c in range(1, C):
        xc = xg_ref[0, 0, :, c:c + 1]
        xn = xn + xc * xc
        cross = cross + xc[None] * yb_ref[0, :, c, :][:, None, :]
    d2 = jnp.maximum(xn[None] + yn_ref[:] - 2.0 * cross, 0.0)
    return jnp.exp(-d2), d2


# ---------------------------------------------------------------------------
# Kernels: the fused fwd/bwd bodies with block statics. The PDE sections are
# line-for-line the pair-tile kernels' (pallas_sigkernel.py:242-286,735-821);
# only the _g_row/_yn_init call sites and the pull-back's x/y reads differ.
# ---------------------------------------------------------------------------


def _fwd_kernel_b3(lx1, ly1, bpc, has_rc, xg0_ref, xg1_ref, yb_ref, k_ref,
                   ck_ref, *rest):
    if has_rc:
        rc_ref, row_ref, a_ref, b_ref, grow_ref, yn_ref = rest
    else:
        rc_ref, (row_ref, a_ref, b_ref, grow_ref, yn_ref) = None, rest
    r = pl.program_id(1)
    gy = ly1 * _M

    @pl.when(r == 0)
    def _():
        row_ref[:] = jnp.ones_like(row_ref)
        _yn_init_b(yb_ref, yn_ref, yb_ref.shape[2])
        g0, _ = _g_row_b(xg0_ref, yb_ref, yn_ref)
        grow_ref[:] = g0

    gl = grow_ref[:]
    gu, _ = _g_row_b(xg1_ref, yb_ref, yn_ref)
    z = (gu[1:] - gu[:-1] - gl[1:] + gl[:-1]) * _ZS
    grow_ref[:] = gu
    a_ref[:], b_ref[:] = _coef(z)
    if has_rc:
        pre = row_ref[gy]
    carries = _band_sweep(ly1, row_ref, a_ref, b_ref)
    if has_rc:
        rc_ref[0, 0, 0] = pre
        for s in range(1, _M):
            rc_ref[0, 0, s] = carries[s - 1]

    @pl.when(((r + 1) % bpc == 0) | (r == lx1 - 1))
    def _():
        ck_ref[0, 0] = row_ref[pl.ds(0, gy + 1)]

    @pl.when(r == lx1 - 1)
    def _():
        k_ref[0] = row_ref[gy]


def _bwd_kernel_b3(lx1, ly1, bpc,
                   xg0_ref, xg1_ref, yb_ref, rc_ref, ck_ref, gout_ref,
                   dxg_ref, dxg0_ref, dyg_ref,
                   kbuf_ref, gbuf_ref, a_ref, b_ref, au_ref, bu_ref,
                   bi_ref, zrow_ref, dz_ref, grow_ref, d2row_ref,
                   yn_ref, dgc_ref):
    r = pl.program_id(1)
    b = lx1 - 1 - r
    C = yb_ref.shape[2]

    @pl.when(r == 0)
    def _():
        gbuf_ref[:] = jnp.zeros_like(gbuf_ref)
        au_ref[:] = jnp.zeros_like(au_ref)
        bu_ref[:] = jnp.zeros_like(bu_ref)
        _yn_init_b(yb_ref, yn_ref, C)
        gu0, d2u0 = _g_row_b(xg1_ref, yb_ref, yn_ref)  # g row lx1
        grow_ref[:] = gu0
        d2row_ref[:] = d2u0
        dgc_ref[:] = jnp.zeros_like(dgc_ref)
        dyg_ref[0] = jnp.zeros_like(dyg_ref[0])
        dxg0_ref[0, 0] = jnp.zeros_like(dxg0_ref[0, 0])

    @pl.when(r != 0)
    def _():
        au_ref[:] = a_ref[:]
        bu_ref[:] = b_ref[:]

    gl, d2l = _g_row_b(xg0_ref, yb_ref, yn_ref)  # g row b
    gu = grow_ref[:]                              # g row b+1 (carried)
    zrow_ref[:] = (gu[1:] - gu[:-1] - gl[1:] + gl[:-1]) * _ZS
    a_ref[:], b_ref[:] = _coef(zrow_ref[:])
    bi_ref[:] = 1.0 / b_ref[:]

    @pl.when(((b + 1) % bpc == 0) | (b == lx1 - 1))
    def _():
        kbuf_ref[1] = ck_ref[0, 0]

    _bwd_rows_fast(
        ly1, r,
        lambda cc: zrow_ref[cc],
        lambda cc: dz_ref[cc],
        lambda cc, v: dz_ref.__setitem__(cc, v),
        lambda s: rc_ref[0, 0, s],
        gout_ref, kbuf_ref, gbuf_ref, a_ref, b_ref, au_ref, bu_ref, bi_ref,
    )

    # ---- statics pull-back (block reads; per-pair-slot outputs) -----------
    dz = dz_ref[:]
    e = jnp.concatenate([-dz[:1], dz[:-1] - dz[1:], dz[-1:]], axis=0) * _ZS
    dgu = dgc_ref[:] + e
    dd2 = jnp.where(d2row_ref[:] > 0.0, dgu * (-gu), 0.0)  # [Ly, Sb, 128]
    sd = jnp.sum(dd2, axis=0)
    for c in range(C):
        yc = yb_ref[0, :, c, :][:, None, :]          # [Ly, 1, 128]
        x1c = xg1_ref[0, 0, :, c:c + 1]              # [Sb, 1]
        dxg_ref[0, 0, c] = 2.0 * (x1c * sd - jnp.sum(dd2 * yc, axis=0))
        dyg_ref[0, :, c] = dyg_ref[0, :, c] + 2.0 * (yc - x1c[None]) * dd2
    dgc_ref[:] = -e
    grow_ref[:] = gl
    d2row_ref[:] = d2l

    @pl.when(r == lx1 - 1)
    def _():
        dd20 = jnp.where(d2l > 0.0, dgc_ref[:] * (-gl), 0.0)
        sd0 = jnp.sum(dd20, axis=0)
        for c in range(C):
            yc = yb_ref[0, :, c, :][:, None, :]
            x0c = xg0_ref[0, 0, :, c:c + 1]
            dxg0_ref[0, 0, c] = 2.0 * (x0c * sd0 - jnp.sum(dd20 * yc, axis=0))
            dyg_ref[0, :, c] = dyg_ref[0, :, c] + 2.0 * (yc - x0c[None]) * dd20


# ---------------------------------------------------------------------------
# Launch wrappers (mirror _fused_fwd_call/_fused_bwd_call with block specs).
# ---------------------------------------------------------------------------


def _fwd_call_b3(xb, yb, with_ck):
    """xb [T, L, 16, C] row blocks · yb [T, L, C, 128] col blocks."""
    T, L = xb.shape[0], xb.shape[1]
    lx1 = L - 1
    ly = L
    ly1 = ly - 1
    C = xb.shape[3]
    bpc = _bands_per_ck(lx1) if with_ck else lx1
    G1 = ly1 * _M + 1
    nslots = _n_ck_slots(lx1, bpc)
    kern = partial(_fwd_kernel_b3, lx1, ly1, bpc, with_ck)
    out_specs = [
        pl.BlockSpec((1, _S, 128), lambda p, r: (p, 0, 0)),
        pl.BlockSpec((1, 1, G1, _S, 128), lambda p, r: (p, r // bpc, 0, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((T, _S, 128), xb.dtype),
        jax.ShapeDtypeStruct((T, nslots, G1, _S, 128), xb.dtype),
    ]
    if with_ck:
        out_specs.append(
            pl.BlockSpec((1, 1, _M, _S, 128), lambda p, r: (p, r, 0, 0, 0))
        )
        out_shape.append(
            jax.ShapeDtypeStruct((T, lx1, _M, _S, 128), xb.dtype)
        )
    out = pl.pallas_call(
        kern,
        grid=(T, lx1),
        in_specs=[
            pl.BlockSpec((1, 1, _SB, C), lambda p, r: (p, r, 0, 0)),
            pl.BlockSpec((1, 1, _SB, C), lambda p, r: (p, r + 1, 0, 0)),
            pl.BlockSpec((1, L, C, _LB), lambda p, r: (p, 0, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((G1 + _M, _S, 128), xb.dtype),  # row (+garbage cell)
            pltpu.VMEM((ly1, _S, 128), xb.dtype),      # a
            pltpu.VMEM((ly1, _S, 128), xb.dtype),      # b
            pltpu.VMEM((ly, _S, 128), xb.dtype),       # grow
            pltpu.VMEM((ly, _S, 128), xb.dtype),       # yn
        ],
        compiler_params=_params(),
        interpret=_interpret(),
    )(xb, xb, yb)
    if with_ck:
        return out
    return out[0]


def _bwd_call_b3(xb, yb, cks, rcs, ms):
    T, L = xb.shape[0], xb.shape[1]
    lx1 = L - 1
    ly = L
    ly1 = ly - 1
    C = xb.shape[3]
    bpc = _bands_per_ck(lx1)
    G1 = ly1 * _M + 1
    G2 = G1 + _M
    kern = partial(_bwd_kernel_b3, lx1, ly1, bpc)

    def slot(r):
        return (lx1 - 1 - r) // bpc

    dxg_rows, dxg0, dyg = pl.pallas_call(
        kern,
        grid=(T * _NH, lx1),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 8, C),
                lambda p, r: (p // _NH, lx1 - 1 - r, p % _NH, 0),
            ),
            pl.BlockSpec(
                (1, 1, 8, C),
                lambda p, r: (p // _NH, lx1 - r, p % _NH, 0),
            ),
            pl.BlockSpec((1, L, C, _LB), lambda p, r: (p // _NH, 0, 0, 0)),
            pl.BlockSpec(
                (1, 1, _M, 8, 128),
                lambda p, r: (p // _NH, lx1 - 1 - r, 0, p % _NH, 0),
            ),
            pl.BlockSpec(
                (1, 1, G1, 8, 128),
                lambda p, r: (p // _NH, slot(r), 0, p % _NH, 0),
            ),
            pl.BlockSpec((1, 8, 128), lambda p, r: (p // _NH, p % _NH, 0)),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, C, 8, 128),
                lambda p, r: (p // _NH, lx1 - 1 - r, 0, p % _NH, 0),
            ),
            pl.BlockSpec(
                (1, 1, C, 8, 128), lambda p, r: (p // _NH, 0, 0, p % _NH, 0)
            ),
            pl.BlockSpec(
                (1, ly, C, 8, 128), lambda p, r: (p // _NH, 0, 0, p % _NH, 0)
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, lx1, C, _S, 128), xb.dtype),
            jax.ShapeDtypeStruct((T, 1, C, _S, 128), xb.dtype),
            jax.ShapeDtypeStruct((T, ly, C, _S, 128), xb.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, G1, 8, 128), xb.dtype),   # kbuf
            pltpu.VMEM((2, G2, 8, 128), xb.dtype),   # gbuf
            pltpu.VMEM((ly1, 8, 128), xb.dtype),     # a
            pltpu.VMEM((ly1, 8, 128), xb.dtype),     # b
            pltpu.VMEM((ly1, 8, 128), xb.dtype),     # au
            pltpu.VMEM((ly1, 8, 128), xb.dtype),     # bu
            pltpu.VMEM((ly1, 8, 128), xb.dtype),     # bi
            pltpu.VMEM((ly1, 8, 128), xb.dtype),     # zrow
            pltpu.VMEM((ly1, 8, 128), xb.dtype),     # dz
            pltpu.VMEM((ly, 8, 128), xb.dtype),      # grow
            pltpu.VMEM((ly, 8, 128), xb.dtype),      # d2row
            pltpu.VMEM((ly, 8, 128), xb.dtype),      # yn
            pltpu.VMEM((ly, 8, 128), xb.dtype),      # dgc
        ],
        compiler_params=_params(),
        interpret=_interpret(),
    )(xb, xb, yb, rcs, cks, ms)
    return jnp.concatenate([dxg0, dxg_rows], axis=1), dyg


# ---------------------------------------------------------------------------
# Host entries.
# ---------------------------------------------------------------------------


def _prep_blocks3(X, h, I, J):
    n, L, C = X.shape
    n_pad = _cdiv(n, _LB) * _LB
    nI, nJ = n_pad // _SB, n_pad // _LB
    Xp = jnp.zeros((n_pad, L, C), X.dtype).at[:n].set(X)
    scale = jax.lax.rsqrt(h).astype(X.dtype)
    Xs = Xp * scale
    xb = jnp.transpose(Xs.reshape(nI, _SB, L, C), (0, 2, 1, 3))[I]
    yb = jnp.transpose(Xs, (1, 2, 0)).reshape(L, C, nJ, _LB)
    yb = jnp.transpose(yb, (2, 0, 1, 3))[J]
    return n_pad, nI, nJ, scale, xb, yb


def _reduce_grads(dxg, dyg, I, J, nI, nJ, n_pad, L, C, scale):
    """Per-pair-slot kernel gradients → particle gradients: lane-sum the x
    rows, sublane-sum the y block, segment-add over tiles."""
    dxr = jnp.sum(dxg, axis=-1)                       # [T, L, C, 16]
    dxr = jnp.transpose(dxr, (0, 3, 1, 2))            # [T, 16, L, C]
    dX1 = jnp.zeros((nI, _SB, L, C), dxr.dtype).at[I].add(dxr)
    dyc = jnp.sum(dyg, axis=-2)                       # [T, L, C, 128]
    dY1 = jnp.zeros((nJ, L, C, _LB), dyc.dtype).at[J].add(dyc)
    dY1 = jnp.transpose(dY1, (0, 3, 1, 2))            # [nJ, 128, L, C]
    return (dX1.reshape(n_pad, L, C) + dY1.reshape(n_pad, L, C)) * scale


def block3_gram_and_grad(X: jax.Array, h: jax.Array):
    """Symmetric dyadic-3 Gram and halved full-sum pull-back — the
    ``gram_and_grad`` contract, via the block-tile schedule."""
    n, L, C = X.shape
    n_pad = _cdiv(n, _LB) * _LB
    I, J, seed = _tile_lists(n_pad)
    ms = jnp.asarray(_mask_seed_blocks(n, I, J, seed))
    n_pad, nI, nJ, scale, xb, yb = _prep_blocks3(X, h, I, J)
    k_t, cks, rcs = _fwd_call_b3(xb, yb, with_ck=True)
    dxg, dyg = _bwd_call_b3(xb, yb, cks, rcs, ms)
    K = _assemble_k(k_t, n, n_pad, nI, nJ, I, J, X.dtype)
    dX = _reduce_grads(dxg, dyg, I, J, nI, nJ, n_pad, L, C, scale)
    return K, 0.5 * dX[:n]


def block3_tiles_ks_partial(X, h, s, I, J, seed, w):
    """Per-device partial ``K@s`` + pull-back over a tile subset (same
    contract as ``pallas_sigkernel_block.block_tiles_ks_partial``)."""
    n, L, C = X.shape
    n_pad = _cdiv(n, _LB) * _LB
    nI, nJ = n_pad // _SB, n_pad // _LB
    sp = jnp.zeros((n_pad, s.shape[1]), s.dtype).at[:n].set(s)
    n_pad, nI, nJ, scale, xb, yb = _prep_blocks3(X, h, I, J)
    rows = I[:, None] * _SB + jnp.arange(_SB)[None, :]
    cols = J[:, None] * _LB + jnp.arange(_LB)[None, :]
    m = (rows[:, :, None] < n) & (cols[:, None, :] < n)
    ms = m.astype(X.dtype) * (seed * w)[:, None, None]
    k_t, cks, rcs = _fwd_call_b3(xb, yb, with_ck=True)
    dxg, dyg = _bwd_call_b3(xb, yb, cks, rcs, ms)
    k_t = k_t * jnp.where(m, 1.0, 0.0)
    s_rows = sp.reshape(nI, _SB, -1)
    s_cols = sp.reshape(nJ, _LB, -1)
    ks_r = jnp.einsum("tsl,tld->tsd", k_t, s_cols[J]) * w[:, None, None]
    ks_c = jnp.einsum("tsl,tsd->tld", k_t, s_rows[I]) * (
        w * (seed - 1.0)
    )[:, None, None]
    ks = (
        jnp.zeros((nI, _SB, sp.shape[1]), X.dtype).at[I].add(ks_r)
        .reshape(n_pad, -1)
        .reshape(nJ, _LB, -1).at[J].add(ks_c).reshape(n_pad, -1)
    )
    dX = _reduce_grads(dxg, dyg, I, J, nI, nJ, n_pad, L, C, scale)
    return ks, dX
