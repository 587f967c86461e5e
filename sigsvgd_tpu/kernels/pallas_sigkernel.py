"""Pallas TPU kernels for the Goursat-PDE signature kernel (dyadic order 3).

The XLA anti-diagonal wavefront (``sigkernel.solve_goursat_pde``) touches the
whole ``[pairs, G]`` diagonal in HBM on every one of its 2G scan steps — at
the flagship MPC scale (~5·10⁵ pairs, G=320) that is HBM-roofline-bound and
tens of seconds per Gram+adjoint. These kernels keep the sweep VMEM-resident
and stream everything else:

  * layout: 1024 pairs per program packed ``[8, 128]`` (one full vreg per
    elementwise op); the fine-column axis ``j`` lives on the LEADING
    (untiled) dimension of every buffer, so the within-row recurrence
    indexes rows dynamically with no sublane-alignment constraints;
  * grid ``(pair_tiles, lx1)``: the second axis walks coarse-row BANDS of 8
    fine rows; the z increments, checkpoints, and (backward) dz blocks
    stream per band, so VMEM holds only O(G) state per tile — independent
    of the path length in the row direction;
  * forward: bands bottom-up; within a band, 8 rows of the first-order
    recurrence ``k[i,j] = (k[i,j-1] + k[i-1,j])·a − k[i-1,j-1]·b`` advance
    in place over a single row buffer; every ``bands_per_ck`` bands the row
    is checkpointed to HBM;
  * backward (custom VJP): bands top-down; per row, the adjoint recurrence
    sweeps right-to-left while the primal rows it needs are RECONSTRUCTED
    by inverting the forward recurrence, re-anchored at the streamed
    checkpoint rows (drift-bounding); ∂out/∂z accumulates in the band's dz
    output block.  The dL/dk seed is folded INTO the top row's sweep so it
    propagates to the nodes left of (gx, gy).

Specialised to ``dyadic_order == 3`` (the reference maze/MPC setting,
``particle_maze_config.yaml:20``); other orders use the MXU block-propagator
(≥4) or the XLA wavefront.  The band row-loop is unrolled in Python: the row
parity ``i & 1 == t_loc & 1`` is then static, which Mosaic requires for
stores through the buffers' leading index (traced store indices silently
corrupt the slot selection).

Measured (v5e, chained dispatch): forward bit-exact vs the XLA scan solver,
adjoint 8e-5; 0.72 µs/pair forward and 2.6 µs/pair forward+backward at 16k
pairs — ~12x the first-generation ``[1, 128]``-lane kernel and ~25x the XLA
scan at the same batch.  Validated against ``solve_goursat_pde_scan``
(values + VJP) in interpret mode on CPU (tests/test_pallas_sigkernel.py)
and on device.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LAM = 3
_M = 1 << _LAM  # 8 — fine rows per band / fine cols per coarse cell
_P = 1024       # pairs per program, shaped [8, 128]


def pallas_supported(lx1: int, ly1: int, dyadic_order: int) -> bool:
    return dyadic_order == _LAM


def _bands_per_ck(lx1: int) -> int:
    """Checkpoint every ``bpc`` bands (largest divisor of lx1 ≤ 6 keeps the
    reconstruction drift span ≤ 48 fine rows, matching the XLA adjoint)."""
    best = 1
    for d in range(1, 7):
        if lx1 % d == 0:
            best = d
    return best


def _coef(z):
    return 1.0 + 0.5 * z + z * z * (1.0 / 12.0), 1.0 - z * z * (1.0 / 12.0)


# ---------------------------------------------------------------------------
# Forward kernel.
# ---------------------------------------------------------------------------


def _fwd_kernel(lx1, ly1, bpc, z_ref, k_ref, ck_ref, row_ref, a_ref, b_ref):
    """Grid (ntiles, lx1): advance the 8 fine rows of one coarse band.

    z_ref [1, ly1, 1, 8, 128] · k_ref [1, 8, 128] · ck_ref [1, 1, G1, 8, 128]
    row_ref [G1, 8, 128] scratch · a_ref/b_ref [ly1, 8, 128] scratch.
    """
    r = pl.program_id(1)
    gy = ly1 * _M

    @pl.when(r == 0)
    def _():
        row_ref[:] = jnp.ones_like(row_ref)

    a_ref[:], b_ref[:] = _coef(z_ref[0, :, 0])

    def one_row(_i, carry):
        def cell(w, kc):
            kl, corner = kc  # k[i, 8w], k[i-1, 8w]
            a = a_ref[w]
            b = b_ref[w]
            old = row_ref[pl.ds(w * _M + 1, _M)]  # k[i-1, 8w+1..8w+8]
            news = []
            for t in range(_M):
                kl = (kl + old[t]) * a - corner * b
                corner = old[t]
                news.append(kl)
            row_ref[pl.ds(w * _M + 1, _M)] = jnp.stack(news)
            return kl, corner

        ones = row_ref[0]
        lax.fori_loop(0, ly1, cell, (ones, ones))
        return carry

    lax.fori_loop(0, _M, one_row, 0)

    @pl.when((r + 1) % bpc == 0)
    def _():
        ck_ref[0, 0] = row_ref[:]

    @pl.when(r == lx1 - 1)
    def _():
        k_ref[0] = row_ref[gy]


# ---------------------------------------------------------------------------
# Backward kernel: top-down adjoint + primal reconstruction, band-streamed.
# ---------------------------------------------------------------------------


def _bwd_kernel(lx1, ly1, bpc, z_ref, ck_ref, gout_ref, dz_ref,
                kbuf_ref, gbuf_ref, a_ref, b_ref, au_ref, bu_ref, ai_ref):
    """Grid (ntiles, lx1), band b = lx1-1-r (descending).

    z_ref [1, ly1, 1, 8, 128] (band b) · ck_ref [1, 1, G1, 8, 128] (anchor
    row 8b+8 when (b+1)%bpc==0) · gout_ref [1, 8, 128] · dz_ref
    [1, ly1, 1, 8, 128] out · kbuf/gbuf [2, G2, 8, 128] scratch (G2 = G1+M;
    the zero-padded tail doubles as the ĝ[·, >gy] = 0 boundary) · a/b the
    current band's coefficients · au/bu the band above's (for the top row's
    ĝ[i+1, ·] terms).
    """
    r = pl.program_id(1)
    b = lx1 - 1 - r
    gy = ly1 * _M

    @pl.when(r == 0)
    def _():
        gbuf_ref[:] = jnp.zeros_like(gbuf_ref)
        # row gx+1 coefficients are never used (ĝ there is 0) but the
        # uninitialised scratch must not inject NaN x 0
        au_ref[:] = jnp.zeros_like(au_ref)
        bu_ref[:] = jnp.zeros_like(bu_ref)

    @pl.when(r != 0)
    def _():
        au_ref[:] = a_ref[:]
        bu_ref[:] = b_ref[:]

    a_ref[:], b_ref[:] = _coef(z_ref[0, :, 0])
    # per-cell reciprocal once per band: the reconstruction sweep would
    # otherwise issue a hardware divide per STEP (8 per cell, ~an order of
    # magnitude slower than multiply on the VPU)
    ai_ref[:] = 1.0 / a_ref[:]

    @pl.when((b + 1) % bpc == 0)
    def _():
        # band-top anchor: primal row 8b+8 (even row -> parity slot 0)
        kbuf_ref[0, pl.ds(0, gy + 1)] = ck_ref[0, 0]

    def dz_zero(w, c):
        dz_ref[0, w, 0] = jnp.zeros_like(dz_ref[0, w, 0])
        return c

    lax.fori_loop(0, ly1, dz_zero, 0)

    # unrolled over the band's 8 rows, i = 8b+8 - t_loc descending; the row
    # parity i & 1 == t_loc & 1 is static (8b+8 is even), which keeps every
    # kbuf/gbuf leading store index a compile-time constant
    for t_loc in range(_M):
        par = t_loc & 1
        top = t_loc == 0  # row i+1 lives in the band above

        # ---- adjoint row i (cells right-to-left) -------------------------
        # ĝ[i,j] = a(i,j+1)·ĝ[i,j+1] + a(i+1,j)·ĝ[i+1,j] − b(i+1,j+1)·ĝ[i+1,j+1]
        def adj_cell(cc, g_right, par=par, top=top):
            w = ly1 - 1 - cc
            a_cur = a_ref[w]
            a_up = au_ref[w] if top else a_ref[w]
            b_up = bu_ref[w] if top else b_ref[w]
            wr = jnp.minimum(w + 1, ly1 - 1)
            a_cur_r = a_ref[wr]
            b_up_r = bu_ref[wr] if top else b_ref[wr]
            gup = gbuf_ref[1 - par, pl.ds(w * _M + 1, _M + 1)]  # row i+1
            news = [None] * _M
            for tt in range(_M - 1, -1, -1):
                a_r = a_cur_r if tt == _M - 1 else a_cur
                bu = b_up_r if tt == _M - 1 else b_up
                g = a_r * g_right + a_up * gup[tt] - bu * gup[tt + 1]
                if top and tt == _M - 1:
                    # dL/dk seed at (gx, gy), folded INTO the sweep so it
                    # reaches the nodes left of gy in the same row
                    g = g + jnp.where(
                        (r == 0) & (w == ly1 - 1), gout_ref[0], 0.0
                    )
                news[tt] = g
                g_right = g
            gbuf_ref[par, pl.ds(w * _M + 1, _M)] = jnp.stack(news)
            return g_right

        zero = jnp.zeros_like(gbuf_ref[0, 0])
        lax.fori_loop(0, ly1, adj_cell, zero)

        # ---- reconstruct primal row i-1 (ascending) ----------------------
        # k[i-1,j] = (k[i,j] + k[i-1,j-1]·b)·a⁻¹ − k[i,j-1]
        def rec_cell(w, kdl, par=par):
            ai = ai_ref[w]
            bb = b_ref[w]
            kc = kbuf_ref[par, pl.ds(w * _M, _M + 1)]  # row i, 8w..8w+8
            outs = []
            for tt in range(_M):
                kdl = (kc[tt + 1] + kdl * bb) * ai - kc[tt]
                outs.append(kdl)
            kbuf_ref[1 - par, pl.ds(w * _M + 1, _M)] = jnp.stack(outs)
            return kdl

        kbuf_ref[1 - par, 0] = jnp.ones_like(kbuf_ref[0, 0])
        ones = jnp.ones_like(kbuf_ref[0, 0])
        lax.fori_loop(0, ly1, rec_cell, ones)

        # ---- dz for row i: ∂k[i,j]/∂z = (l+u)(½+z/6) + c·z/6 -------------
        def dz_cell(w, c, par=par):
            z = z_ref[0, w, 0]
            g_here = gbuf_ref[par, pl.ds(w * _M + 1, _M)]
            kcur = kbuf_ref[par, pl.ds(w * _M, _M)]        # left k[i, 8w..]
            up = kbuf_ref[1 - par, pl.ds(w * _M + 1, _M)]  # k[i-1, 8w+1..]
            corner = kbuf_ref[1 - par, pl.ds(w * _M, _M)]
            contrib = g_here * ((kcur + up) * (0.5 + z / 6.0) + corner * (z / 6.0))
            dz_ref[0, w, 0] = dz_ref[0, w, 0] + jnp.sum(contrib, axis=0)
            return c

        lax.fori_loop(0, ly1, dz_cell, 0)


# ---------------------------------------------------------------------------
# Host wrappers + custom VJP.
# ---------------------------------------------------------------------------


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _params():
    return pltpu.CompilerParams(
        dimension_semantics=(
            pltpu.GridDimensionSemantics.PARALLEL,
            pltpu.GridDimensionSemantics.ARBITRARY,
        )
    )


def _pad_pairs(x):
    """[B, lx1, ly1] -> [lx1, ly1, nt, 8, 128] (+ original B, tile count)."""
    b, lx1, ly1 = x.shape
    nt = -(-b // _P)
    pad = nt * _P - b
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, lx1, ly1), x.dtype)])
    z = jnp.transpose(x, (1, 2, 0)).reshape(lx1, ly1, nt, 8, 128)
    return z, b, nt


def _fwd_call(z, nt, lx1, ly1, with_ck):
    # no-grad path: one dummy checkpoint store at the top band only (bpc =
    # lx1) — pallas_call outputs cannot be DCE'd, so shrinking the slot count
    # and store frequency is what avoids streaming dead rows to HBM
    bpc = _bands_per_ck(lx1) if with_ck else lx1
    G1 = ly1 * _M + 1
    nslots = lx1 // bpc
    kern = partial(_fwd_kernel, lx1, ly1, bpc)
    k, cks = pl.pallas_call(
        kern,
        grid=(nt, lx1),
        in_specs=[
            pl.BlockSpec((1, ly1, 1, 8, 128), lambda p, r: (r, 0, p, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda p, r: (p, 0, 0)),
            pl.BlockSpec((1, 1, G1, 8, 128), lambda p, r: (p, r // bpc, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nt, 8, 128), z.dtype),
            jax.ShapeDtypeStruct((nt, nslots, G1, 8, 128), z.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((G1, 8, 128), z.dtype),
            pltpu.VMEM((ly1, 8, 128), z.dtype),
            pltpu.VMEM((ly1, 8, 128), z.dtype),
        ],
        compiler_params=_params(),
        interpret=_interpret(),
    )(z)
    if with_ck:
        return k, cks
    return k


def _bwd_call(z, cks, g_out, nt, lx1, ly1):
    bpc = _bands_per_ck(lx1)
    G1 = ly1 * _M + 1
    G2 = G1 + _M
    kern = partial(_bwd_kernel, lx1, ly1, bpc)

    def slot(r):
        b = lx1 - 1 - r
        return jnp.maximum(0, (b + 1) // bpc - 1)

    dz = pl.pallas_call(
        kern,
        grid=(nt, lx1),
        in_specs=[
            pl.BlockSpec(
                (1, ly1, 1, 8, 128), lambda p, r: (lx1 - 1 - r, 0, p, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, G1, 8, 128), lambda p, r: (p, slot(r), 0, 0, 0)
            ),
            pl.BlockSpec((1, 8, 128), lambda p, r: (p, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, ly1, 1, 8, 128), lambda p, r: (lx1 - 1 - r, 0, p, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((lx1, ly1, nt, 8, 128), z.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, G2, 8, 128), z.dtype),
            pltpu.VMEM((2, G2, 8, 128), z.dtype),
            pltpu.VMEM((ly1, 8, 128), z.dtype),
            pltpu.VMEM((ly1, 8, 128), z.dtype),
            pltpu.VMEM((ly1, 8, 128), z.dtype),
            pltpu.VMEM((ly1, 8, 128), z.dtype),
            pltpu.VMEM((ly1, 8, 128), z.dtype),
        ],
        compiler_params=_params(),
        interpret=_interpret(),
    )(z, cks, g_out)
    return dz


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def solve_goursat_pde_pallas(inc: jax.Array, dyadic_order: int) -> jax.Array:
    """Drop-in for :func:`sigkernel.solve_goursat_pde` at dyadic order 3:
    ``inc [B, lx1, ly1]`` coarse increments → ``[B]`` kernel values with a
    VMEM-resident custom adjoint. Runs in interpret mode off-TPU (so CPU
    tests exercise the same code)."""
    assert dyadic_order == _LAM, "pallas solver is specialised to dyadic 3"
    z, b, nt = _pad_pairs(inc / float(4**_LAM))
    lx1, ly1 = inc.shape[1], inc.shape[2]
    return _fwd_call(z, nt, lx1, ly1, with_ck=False).reshape(-1)[:b]


def _pde_fwd(inc, dyadic_order):
    # the differentiated path emits the checkpoint rows as RESIDUALS, so the
    # backward does not re-run the forward; under an outer jax.checkpoint
    # (the chunked-Gram pipeline) they are rematerialised at backward time
    # rather than stored, so peak memory is unchanged
    z, b, nt = _pad_pairs(inc / float(4**_LAM))
    lx1, ly1 = inc.shape[1], inc.shape[2]
    k, cks = _fwd_call(z, nt, lx1, ly1, with_ck=True)
    return k.reshape(-1)[:b], (z, cks, b, nt, lx1, ly1)


def _pde_bwd(dyadic_order, res, g_out):
    z, cks, b, nt, lx1, ly1 = res
    gp = jnp.zeros((nt * _P,), g_out.dtype).at[:b].set(g_out).reshape(nt, 8, 128)
    dz = _bwd_call(z, cks, gp, nt, lx1, ly1)  # [lx1, ly1, nt, 8, 128]
    dinc = jnp.transpose(dz.reshape(lx1, ly1, -1), (2, 0, 1))[:b] / float(4**_LAM)
    return (dinc,)


solve_goursat_pde_pallas.defvjp(_pde_fwd, _pde_bwd)
