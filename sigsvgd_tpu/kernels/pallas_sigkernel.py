"""Pallas TPU kernels for the Goursat-PDE signature kernel (dyadic order 3).

The XLA anti-diagonal wavefront (``sigkernel.solve_goursat_pde``) touches the
whole ``[pairs, G]`` diagonal in HBM on every one of its 2G scan steps — at
the flagship MPC scale (10⁶ pairs, G=320) that is terabytes of HBM traffic
and tens of seconds per Gram. These kernels keep the sweep VMEM-resident:

  * layout: the pair batch rides the LANE axis (``[..., B_t]`` tiles, grid
    over pair tiles); the per-tile working set (z/a/b fields, k rows, adjoint
    rows, dz accumulator) fits VMEM;
  * forward: rows bottom-up; the within-row first-order recurrence advances
    through ALIGNED 16-sublane windows (Mosaic requires sublane offsets ≡ 0
    mod 8), one window per 2^λ-wide coarse cell, with carried left-columns
    and read-modify-write stores;
  * backward (custom VJP): the adjoint recurrence is the same row sweep run
    top-down (right-to-left in-row); the primal rows it needs are
    RECONSTRUCTED on the way down by inverting the recurrence, re-anchored
    at checkpoint rows a forward pre-pass wrote to HBM (drift-bounding, the
    same scheme as the XLA adjoint's segments); ∂out/∂z accumulates in a
    VMEM coarse grid laid out ``[cells, 1, B]`` so cell indexing stays off
    the tiled sublane axis.

Specialised to ``dyadic_order == 3`` (the reference maze/MPC setting,
``particle_maze_config.yaml:20``): one 8-cell window per coarse cell. Other
orders use the MXU propagator (≥4) or the XLA wavefront.

HBM traffic per Gram+grad: z fields + checkpoints + dz once — O(B·(L² +
G²/ckpt)) instead of O(B·G²) per diagonal step. Validated against
``solve_goursat_pde_scan`` (values + VJP) in interpret mode on CPU
(tests/test_pallas_sigkernel.py) and on device.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 128       # pairs per forward kernel program (lane-axis tile; 256
                  # OOMs scoped VMEM at the flagship 40x40 grid once the
                  # batch grid is >1 and Mosaic double-buffers the blocks)
_TILE_BWD = 128   # backward holds more VMEM state (dz + both row pairs)
_LAM = 3
_M = 1 << _LAM  # 8 — fine cells per coarse cell == window stride


def _ck_interval(gx: int) -> int:
    """Largest divisor of gx that is ≤ 48 (checkpoint row spacing)."""
    best = 1
    for d in range(1, 49):
        if gx % d == 0:
            best = d
    return best


def pallas_supported(lx1: int, ly1: int, dyadic_order: int) -> bool:
    return dyadic_order == _LAM


def _coef(z):
    return 1.0 + 0.5 * z + z * z * (1.0 / 12.0), 1.0 - z * z * (1.0 / 12.0)


def _win(ref, w):
    """Aligned 16-sublane window starting at fine column 8w."""
    return ref[pl.ds(w * _M, 2 * _M)]


def _win2(ref, lead, w):
    return ref[lead, pl.ds(w * _M, 2 * _M)]


# ---------------------------------------------------------------------------
# Forward kernel (emitting row checkpoints).
# ---------------------------------------------------------------------------


def _fwd_kernel(gx, gy, lx1, ly1, ck, z_ref, out_ref, ck_ref, row_ref,
                a_ref, b_ref):
    """Sweep rows 1..gx; the row buffer updates in place via windowed RMW.

    z_ref/a_ref/b_ref [lx1*ly1, 1, B] · out_ref [1, B] ·
    ck_ref [n_ck, gy+2M, B] · row_ref [gy+2M, B] scratch.
    """
    a_all, b_all = _coef(z_ref[:])
    a_ref[:] = a_all
    b_ref[:] = b_all
    row_ref[:] = jnp.ones_like(row_ref)
    ck_ref[0] = row_ref[:]

    def row_body(i, _):
        ci = (i - 1) >> _LAM

        def cell_body(w, carry):
            kl, kpl = carry  # k[i, 8w], k[i-1, 8w]
            a = a_ref[ci * ly1 + w, 0][None]
            b = b_ref[ci * ly1 + w, 0][None]
            win = _win(row_ref, w)  # [16, B]: slot0 row-i, 1..8 row-(i-1)
            news = []
            for t in range(_M):
                corner = kpl if t == 0 else win[t][None]
                kl = (kl + win[t + 1][None]) * a - corner * b
                news.append(kl)
            row_ref[pl.ds(w * _M, 2 * _M)] = jnp.concatenate(
                [win[0:1]] + news + [win[_M + 1:]], axis=0
            )
            return kl, win[_M][None]

        ones = jnp.ones_like(row_ref[0:1])
        lax.fori_loop(0, ly1, cell_body, (ones, ones))

        @pl.when(i % ck == 0)
        def _():
            ck_ref[i // ck] = row_ref[:]

        return 0

    lax.fori_loop(1, gx + 1, row_body, 0)
    out_ref[:] = row_ref[gy][None]


# ---------------------------------------------------------------------------
# Backward kernel: top-down adjoint sweep + primal reconstruction.
# ---------------------------------------------------------------------------


def _bwd_kernel(gx, gy, lx1, ly1, ck,
                z_ref, ck_ref, gout_ref, dz_ref, kbuf_ref, gbuf_ref,
                a_ref, b_ref):
    """dz_ref [lx1*ly1, 1, B] output. kbuf [2, gy+2M, B]: primal rows i /
    i-1 by parity; gbuf [2, gy+2M, B]: adjoint rows i+1 / i by parity (slots
    beyond gy stay zero — the padding doubles as the ĝ[·, >gy] = 0 boundary).
    """
    a_all, b_all = _coef(z_ref[:])
    a_ref[:] = a_all
    b_ref[:] = b_all
    dz_ref[:] = jnp.zeros_like(dz_ref)
    gbuf_ref[:] = jnp.zeros_like(gbuf_ref)
    kbuf_ref[gx & 1] = ck_ref[gx // ck]  # top primal row

    def row_body(t_row, _):
        i = gx - t_row  # gx .. 1
        par = i & 1
        ci = (i - 1) >> _LAM
        ci_up = jnp.minimum(i, gx - 1) >> _LAM  # cells of row i+1 (clamped)

        # ---- reconstruct primal row i-1 (ascending) into kbuf[1-par] -----
        def rec_cell(w, kdl):
            a = a_ref[ci * ly1 + w, 0][None]
            b = b_ref[ci * ly1 + w, 0][None]
            kc = _win2(kbuf_ref, par, w)  # row i, slots 8w..8w+15
            dwin = _win2(kbuf_ref, 1 - par, w)
            outs = []
            for tt in range(_M):
                # invert: k[i,j] = (k[i,j-1] + k[i-1,j])·a − k[i-1,j-1]·b
                # → k[i-1,j] = (k[i,j] + k[i-1,j-1]·b)/a − k[i,j-1]
                kdl = (kc[tt + 1][None] + kdl * b) / a - kc[tt][None]
                outs.append(kdl)
            kbuf_ref[1 - par, pl.ds(w * _M, 2 * _M)] = jnp.concatenate(
                [dwin[0:1]] + outs + [dwin[_M + 1:]], axis=0
            )
            return kdl

        kbuf_ref[1 - par, 0:1] = jnp.ones_like(kbuf_ref[0, 0:1])
        ones = jnp.ones_like(kbuf_ref[0, 0:1])
        lax.fori_loop(0, ly1, rec_cell, ones)

        @pl.when((i - 1) % ck == 0)
        def _():
            kbuf_ref[1 - par] = ck_ref[(i - 1) // ck]

        # ---- adjoint row i (cells right-to-left) into gbuf[par] ----------
        # ĝ[i,j] = a(i,j+1)·ĝ[i,j+1] + a(i+1,j)·ĝ[i+1,j] − b(i+1,j+1)·ĝ[i+1,j+1]
        def adj_cell(cc, g_right):
            w = ly1 - 1 - cc
            a = a_ref[ci * ly1 + w, 0][None]
            a_up = a_ref[ci_up * ly1 + w, 0][None]
            b_up = b_ref[ci_up * ly1 + w, 0][None]
            wr = jnp.minimum(w + 1, ly1 - 1)
            a_r = a_ref[ci * ly1 + wr, 0][None]
            b_up_r = b_ref[ci_up * ly1 + wr, 0][None]
            gup = _win2(gbuf_ref, 1 - par, w)  # slots 8w..8w+15 of row i+1
            gwin = _win2(gbuf_ref, par, w)
            news = [None] * _M
            for tt in range(_M - 1, -1, -1):
                j = w * _M + 1 + tt
                a_right = a_r if tt == _M - 1 else a
                bu = b_up_r if tt == _M - 1 else b_up
                # ĝ[i+1, j] = gup[1+tt]; ĝ[i+1, j+1] = gup[2+tt] (≤ 15 ✓)
                g = (
                    a_right * g_right
                    + a_up * gup[1 + tt][None]
                    - bu * gup[2 + tt][None]
                )
                g = g + jnp.where((i == gx) & (j == gy), gout_ref[0][None], 0.0)
                news[tt] = g
                g_right = g
            gbuf_ref[par, pl.ds(w * _M, 2 * _M)] = jnp.concatenate(
                [gwin[0:1]] + news + [gwin[_M + 1:]], axis=0
            )
            return g_right

        zero = jnp.zeros_like(gbuf_ref[0, 0:1])
        lax.fori_loop(0, ly1, adj_cell, zero)

        # ---- dz for row i: cells ascending ------------------------------
        def dz_cell(w, _inner):
            z = z_ref[ci * ly1 + w, 0][None]
            gwin = _win2(gbuf_ref, par, w)
            kcur = _win2(kbuf_ref, par, w)
            kdn = _win2(kbuf_ref, 1 - par, w)
            g_here = gwin[1:_M + 1]
            left = kcur[0:_M]
            up = kdn[1:_M + 1]
            corner = kdn[0:_M]
            contrib = g_here * ((left + up) * (0.5 + z / 6.0) + corner * (z / 6.0))
            dz_ref[ci * ly1 + w, 0] = dz_ref[ci * ly1 + w, 0] + jnp.sum(
                contrib, axis=0
            )
            return 0

        lax.fori_loop(0, ly1, dz_cell, 0)
        # row i+1's adjoint values must not leak into row i-1's pass
        gbuf_ref[1 - par] = jnp.zeros_like(gbuf_ref[0])
        return 0

    lax.fori_loop(0, gx, row_body, 0)


# ---------------------------------------------------------------------------
# Host wrappers + custom VJP.
# ---------------------------------------------------------------------------


def _pad_tile(x, axis=-1, tile=_TILE):
    b = x.shape[axis]
    pad = (-b) % tile
    if pad:
        width = [(0, 0)] * x.ndim
        width[axis] = (0, pad)
        x = jnp.pad(x, width)
    return x, b


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_call(z_flat, lx1, ly1, with_ck):
    """z_flat: [lx1*ly1, 1, B] → k [B] (and checkpoints)."""
    gx, gy = lx1 << _LAM, ly1 << _LAM
    ck = _ck_interval(gx)
    n_ck = gx // ck + 1
    rows = gy + 2 * _M
    z_p, b = _pad_tile(z_flat)
    bp = z_p.shape[-1]
    kern = partial(_fwd_kernel, gx, gy, lx1, ly1, ck)
    out, cks = pl.pallas_call(
        kern,
        grid=(bp // _TILE,),
        in_specs=[pl.BlockSpec((lx1 * ly1, 1, _TILE), lambda p: (0, 0, p))],
        out_specs=[
            pl.BlockSpec((1, _TILE), lambda p: (0, p)),
            pl.BlockSpec((n_ck, rows, _TILE), lambda p: (0, 0, p)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, bp), z_flat.dtype),
            jax.ShapeDtypeStruct((n_ck, rows, bp), z_flat.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, _TILE), z_flat.dtype),
            pltpu.VMEM((lx1 * ly1, 1, _TILE), z_flat.dtype),
            pltpu.VMEM((lx1 * ly1, 1, _TILE), z_flat.dtype),
        ],
        interpret=_interpret(),
    )(z_p)
    if with_ck:
        return out[0, :b], cks[..., :b]
    return out[0, :b]


def _bwd_call(z_flat, g_out, lx1, ly1):
    gx, gy = lx1 << _LAM, ly1 << _LAM
    ck = _ck_interval(gx)
    n_ck = gx // ck + 1
    rows = gy + 2 * _M
    _, cks = _fwd_call(z_flat, lx1, ly1, with_ck=True)
    z_p, b = _pad_tile(z_flat, tile=_TILE_BWD)
    ck_p, _ = _pad_tile(cks, tile=_TILE_BWD)
    g_p, _ = _pad_tile(g_out[None, :], tile=_TILE_BWD)
    bp = z_p.shape[-1]
    kern = partial(_bwd_kernel, gx, gy, lx1, ly1, ck)
    dz = pl.pallas_call(
        kern,
        grid=(bp // _TILE_BWD,),
        in_specs=[
            pl.BlockSpec((lx1 * ly1, 1, _TILE_BWD), lambda p: (0, 0, p)),
            pl.BlockSpec((n_ck, rows, _TILE_BWD), lambda p: (0, 0, p)),
            pl.BlockSpec((1, _TILE_BWD), lambda p: (0, p)),
        ],
        out_specs=pl.BlockSpec((lx1 * ly1, 1, _TILE_BWD), lambda p: (0, 0, p)),
        out_shape=jax.ShapeDtypeStruct((lx1 * ly1, 1, bp), z_flat.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows, _TILE_BWD), z_flat.dtype),
            pltpu.VMEM((2, rows, _TILE_BWD), z_flat.dtype),
            pltpu.VMEM((lx1 * ly1, 1, _TILE_BWD), z_flat.dtype),
            pltpu.VMEM((lx1 * ly1, 1, _TILE_BWD), z_flat.dtype),
        ],
        interpret=_interpret(),
    )(z_p, ck_p, g_p)
    return dz[..., :b]


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def solve_goursat_pde_pallas(inc: jax.Array, dyadic_order: int) -> jax.Array:
    """Drop-in for :func:`sigkernel.solve_goursat_pde` at dyadic order 3:
    ``inc [B, lx1, ly1]`` coarse increments → ``[B]`` kernel values with a
    VMEM-resident custom adjoint. Runs in interpret mode off-TPU (so CPU
    tests exercise the same code)."""
    assert dyadic_order == _LAM, "pallas solver is specialised to dyadic 3"
    b, lx1, ly1 = inc.shape
    z = jnp.transpose(inc, (1, 2, 0)).reshape(lx1 * ly1, 1, b) / float(4**_LAM)
    return _fwd_call(z, lx1, ly1, with_ck=False)


def _pde_fwd(inc, dyadic_order):
    b, lx1, ly1 = inc.shape
    z = jnp.transpose(inc, (1, 2, 0)).reshape(lx1 * ly1, 1, b) / float(4**_LAM)
    return _fwd_call(z, lx1, ly1, with_ck=False), (z, lx1, ly1)


def _pde_bwd(dyadic_order, res, g_out):
    z, lx1, ly1 = res
    dz = _bwd_call(z, g_out, lx1, ly1)  # [lx1*ly1, 1, B]
    dinc = jnp.transpose(dz.reshape(lx1, ly1, -1), (2, 0, 1)) / float(4**_LAM)
    return (dinc,)


solve_goursat_pde_pallas.defvjp(_pde_fwd, _pde_bwd)
