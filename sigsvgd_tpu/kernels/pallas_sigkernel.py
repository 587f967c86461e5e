"""Pallas TPU kernels for the Goursat-PDE signature kernel (dyadic order 3).

The XLA anti-diagonal wavefront (``sigkernel.solve_goursat_pde``) touches the
whole ``[pairs, G]`` diagonal in HBM on every one of its 2G scan steps — at
the flagship MPC scale (~5·10⁵ pairs, G=320) that is HBM-roofline-bound and
tens of seconds per Gram+adjoint. These kernels keep the sweep VMEM-resident
and stream everything else:

  * layout: 2048 pairs per program packed ``[16, 128]`` — every elementwise
    op lowers to TWO vreg instructions whose dependency chains are
    independent, so the serial per-cell FMA chain of one half overlaps the
    VPU latency of the other (measured ~1.7x over the [8, 128] layout).
    The fine-column axis ``j`` lives on the LEADING (untiled) dimension of
    every buffer, so the within-row recurrence indexes rows dynamically
    with no sublane-alignment constraints;
  * grid ``(pair_tiles, lx1)``: the second axis walks coarse-row BANDS of 8
    fine rows; the z increments, checkpoints, and (backward) dz blocks
    stream per band, so VMEM holds only O(G) state per tile — independent
    of the path length in the row direction;
  * forward: bands bottom-up; within a band, 8 rows of the first-order
    recurrence ``k[i,j] = (k[i,j-1] + k[i-1,j])·a − k[i-1,j-1]·b`` advance
    in place over a single row buffer; every ``bands_per_ck`` bands the row
    is checkpointed to HBM;
  * backward (custom VJP): bands top-down, TWO schemes sharing the adjoint
    recurrence (both keep [8, 128] tiles — their chains already interleave,
    and the row buffers at [16, 128] would not fit VMEM; BlockSpecs address
    the forward's [16, 128] arrays by splitting the sublane dimension):

    - ``_bwd_rows_stable`` (general increments — ``_solve_tiled`` and the
      unfused pair route): per row, three INDEPENDENT chains interleave in
      one cell loop — adjoint right-to-left, primal row i−1 reconstructed
      LEFT-to-right by inverting the forward recurrence toward +j (divide
      by ``a = 1+z/2+z²/12``; contracting for z>0), dz of the previous row
      pipelined one row behind (reloading its operands from the 3-generation
      primal buffer).
    - ``_bwd_rows_fast`` (fused-statics route, RBF statics only): all three
      chains sweep RIGHT-to-left over one shared cell loop — the primal is
      reconstructed toward −j (divide by ``b = 1−z²/12``), re-anchored every
      row at the exact right-edge column the forward stores, so row i's dz
      operands ĝ[i], k[i], k[i−1] are all register-resident in the same
      iteration (no dz reloads, 2 primal generations, no trailing-row pass).
      The −j inversion amplifies within-row rounding by ~Π(a/b) — safe for
      RBF statics where |z| ≤ 4/4^λ bounds the factor (measured 3e-4 at the
      flagship shape on device), but drifts at large |z| (~2e-3 at |z|≈0.2), which is
      why general increments keep the stable scheme.

    The dL/dk seed is folded INTO the top row's sweep so it propagates to
    the nodes left of (gx, gy).

Specialised to ``dyadic_order == 3`` (the reference maze/MPC setting,
``particle_maze_config.yaml:20``); other orders use the MXU block-propagator
(≥4) or the XLA wavefront.  The band row-loop is unrolled in Python: the row
parity ``i & 1 == t_loc & 1`` is then static, which Mosaic requires for
stores through the buffers' leading index (traced store indices silently
corrupt the slot selection).

Measured (v5e, in-situ at the flagship MPC shape — 525k upper-triangle
pairs, H=40 paths, RBF statics fused): **0.30 µs/pair forward (statics +
checkpoints + right edges) and 0.78 µs/pair backward** (the round-4
staggered-pair sweep), ~560 ms per Gram+adjoint.  Issue-floor analysis:
the backward's three recurrence chains total ~9 FMA-class vector ops per
fine node — the algorithmic minimum for adjoint + primal reconstruction +
dz — and the measured ~8 cycles/node puts the achieved issue rate at the
VPU's practical ceiling: removing the dz chain (−25% ops) saves a
proportional 21% (issue-bound, not latency-bound), while moving 2/3 of the
VMEM slice traffic into loop-carried registers (the staggered-pair sweep)
saves only ~4% (loads/stores dual-issue with ALU).  Precision does not
change this: packed bf16 on this VPU is a STORAGE format — vector×vector
bf16 FMAs issue at the same rate as fp32 (the 2.09x once measured for bf16
came from a scalar-multiplier microbenchmark artifact 17x off the real FMA
path) — so the opt-in delta-form bf16 adjoint (``grad_precision='bf16'``)
delivers ~3.5% gradient error for only ~3% wall-clock; see
docs/bf16_adjoint_study.md for the full evidence chain, including why an
MXU reformulation cannot serve dyadic 3 (per-pair boundary prep on the VPU
rivals the direct sweep).  fp32 stays the default and only value-grade
precision.  Validated against ``solve_goursat_pde_scan`` (values + VJP) in
interpret mode on CPU (tests/test_pallas_sigkernel.py) and on device at b
up to 4096.
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
_S = 16         # forward sublanes per tile (2 vregs -> 2 overlapped chains)
_P = _S * 128   # pairs per forward program
_NH = _S // 8   # [8, 128] half-tiles per forward tile (backward granularity)


def pallas_supported(lx1: int, ly1: int, dyadic_order: int) -> bool:
    # ly1 bound: the row buffers hold G1 = 8*ly1+1 slots of [16,128] (fwd) /
    # [8,128]x(3+2 generations) (bwd) plus double-buffered z/ck blocks —
    # ~24 KB*(G1+ly1) fwd and ~28 KB*G1 bwd of VMEM per program. ly1 <= 48
    # (G1 <= 385, paths up to 49 points) keeps both under ~12 MB of the
    # ~16 MB core budget; longer paths fall back to the XLA wavefront
    # instead of failing Mosaic allocation. lx1 is unbounded (bands stream).
    return dyadic_order == _LAM and ly1 <= 48


def _bands_per_ck(lx1: int) -> int:
    """Checkpoint every ``bpc`` bands (≤ 6 keeps the reconstruction drift
    span ≤ 48 fine rows, matching the XLA adjoint). lx1 need not be a
    multiple: the forward also stores the final band's row, anchoring the
    (possibly partial) top group — at the flagship lx1 = 39 this means 7
    checkpoint slots instead of the 13 a divisor constraint would force
    (the residual rows are the dominant per-pair HBM state)."""
    return min(6, lx1)


def _n_ck_slots(lx1: int, bpc: int) -> int:
    return -(-lx1 // bpc)


def _coef(z):
    return 1.0 + 0.5 * z + z * z * (1.0 / 12.0), 1.0 - z * z * (1.0 / 12.0)


# ---------------------------------------------------------------------------
# Forward kernel.
# ---------------------------------------------------------------------------


def _band_sweep(ly1, row_ref, a_ref, b_ref):
    """Advance one coarse band's 8 fine rows over ``row_ref``.

    The band's 8 rows advance in an intra-band WAVEFRONT: at super-step s,
    row i processes coarse cell ``c = s − i`` (one coarse cell behind the
    row above). The per-cell recurrence is a serial 2-FMA dependency chain
    (~12 cycles of VPU latency); a single row is therefore latency-bound at
    ~25 cycles per [16,128] cell op. Staggering the 8 rows gives 8
    independent chains (×2 vregs = 16), which hides the latency and makes
    the sweep issue/mem-bound (2.0x measured). The FP operations per cell
    and their order within each row are IDENTICAL to the sequential sweep,
    so results are bit-exact.

    Inactive rows (head s < i, tail s − i ≥ ly1) read/write a dedicated
    garbage cell at ``row_ref[G1:]``; their carries are reset to the ones
    boundary when the row reaches cell 0, so junk never enters real cells.

    Returns the final per-row carries ``kl[i] = k[8b+1+i, gy]`` — the band's
    right-edge column, stored by the grad-path forward as the re-anchor for
    the backward's right-to-left primal reconstruction.
    """
    gy = ly1 * _M
    garb = gy + 1  # garbage cell offset (slots garb..garb+M-1)
    ones = row_ref[0]

    def super_step(s, carry):
        new_carry = []
        for i in range(_M):
            kl0, corner = carry[i]
            c = s - i
            active = jnp.logical_and(c >= 0, c < ly1)
            cc = jnp.clip(c, 0, ly1 - 1)
            start = jnp.where(active, c * _M + 1, garb)
            a = a_ref[cc]
            b = b_ref[cc]
            fresh = c == 0
            kl = jnp.where(fresh, ones, kl0)
            corner = jnp.where(fresh, ones, corner)
            old = row_ref[pl.ds(start, _M)]  # k[i-1, 8c+1..8c+8]
            news = []
            for t in range(_M):
                kl = (kl + old[t]) * a - corner * b
                corner = old[t]
                news.append(kl)
            row_ref[pl.ds(start, _M)] = jnp.stack(news)
            # freeze the carry once the row has passed its last real cell so
            # the final kl is exactly k[8b+1+i, gy], not garbage-cell junk
            new_carry.append((jnp.where(active, kl, kl0), corner))
        return tuple(new_carry)

    init = tuple((ones, ones) for _ in range(_M))
    out = lax.fori_loop(0, ly1 + _M - 1, super_step, init)
    return [kl for kl, _ in out]


def _fwd_kernel(lx1, ly1, bpc, z_ref, k_ref, ck_ref, row_ref, a_ref, b_ref):
    """Grid (ntiles, lx1): advance the 8 fine rows of one coarse band.

    z_ref [1, 1, ly1, S, 128] · k_ref [1, S, 128] · ck_ref [1, 1, G1, S, 128]
    row_ref [G1+M, S, 128] scratch · a_ref/b_ref [ly1, S, 128] scratch.
    See :func:`_band_sweep` for the wavefront row schedule.
    """
    r = pl.program_id(1)
    gy = ly1 * _M

    @pl.when(r == 0)
    def _():
        row_ref[:] = jnp.ones_like(row_ref)

    a_ref[:], b_ref[:] = _coef(z_ref[0, 0])
    _band_sweep(ly1, row_ref, a_ref, b_ref)

    @pl.when(((r + 1) % bpc == 0) | (r == lx1 - 1))
    def _():
        ck_ref[0, 0] = row_ref[pl.ds(0, gy + 1)]

    @pl.when(r == lx1 - 1)
    def _():
        k_ref[0] = row_ref[gy]


# ---------------------------------------------------------------------------
# Fused-statics forward: RBF static Gram + increments computed per band in
# VMEM from the (bandwidth-pre-scaled) path tiles — z never touches HBM.
# ---------------------------------------------------------------------------


def _g_row(x_ref, yg_ref, yn_ref):
    """One static-Gram row ``g[j] = exp(-(‖x‖² + ‖y_j‖² - 2⟨x, y_j⟩))`` for a
    path point against all of Y; paths are pre-scaled by rsqrt(h). Returns
    (g [Ly, S, 128], d2 [Ly, S, 128])."""
    C = x_ref.shape[2]
    xn = x_ref[0, 0, 0] * x_ref[0, 0, 0]
    cross = x_ref[0, 0, 0] * yg_ref[0, :, 0]
    for c in range(1, C):
        xn = xn + x_ref[0, 0, c] * x_ref[0, 0, c]
        cross = cross + x_ref[0, 0, c] * yg_ref[0, :, c]
    d2 = jnp.maximum(xn + yn_ref[:] - 2.0 * cross, 0.0)
    return jnp.exp(-d2), d2


def _yn_init(yg_ref, yn_ref):
    C = yg_ref.shape[2]
    yn = yg_ref[0, :, 0] * yg_ref[0, :, 0]
    for c in range(1, C):
        yn = yn + yg_ref[0, :, c] * yg_ref[0, :, c]
    yn_ref[:] = yn


_ZS = 1.0 / float(4**_LAM)  # dyadic grid scale on the increments


def _fused_fwd_kernel(lx1, ly1, bpc, has_rc, xg0_ref, xg1_ref, yg_ref, k_ref,
                      ck_ref, *rest):
    """Fused-statics forward. Grid (ntiles, lx1); band I consumes path rows
    I (carried static-Gram row in ``grow_ref``) and I+1 (computed here):
    ``z[I, J] = (g[I+1,J+1] − g[I+1,J] − g[I,J+1] + g[I,J]) / 4^λ``.

    xg0/xg1 [1, 1, C, S, 128] (path rows I, I+1) · yg [1, Ly, C, S, 128]
    (resident) · grow/yn [Ly, S, 128] scratch. Everything else matches
    :func:`_fwd_kernel`.
    """
    if has_rc:
        rc_ref, row_ref, a_ref, b_ref, grow_ref, yn_ref = rest
    else:
        rc_ref, (row_ref, a_ref, b_ref, grow_ref, yn_ref) = None, rest
    r = pl.program_id(1)
    gy = ly1 * _M

    @pl.when(r == 0)
    def _():
        row_ref[:] = jnp.ones_like(row_ref)
        _yn_init(yg_ref, yn_ref)
        g0, _ = _g_row(xg0_ref, yg_ref, yn_ref)
        grow_ref[:] = g0

    gl = grow_ref[:]                       # g row I
    gu, _ = _g_row(xg1_ref, yg_ref, yn_ref)  # g row I+1
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


# ---------------------------------------------------------------------------
# Backward kernel: top-down adjoint + primal reconstruction, band-streamed.
# ---------------------------------------------------------------------------


def _bwd_kernel(lx1, ly1, bpc, z_ref, ck_ref, gout_ref, dz_ref,
                kbuf_ref, gbuf_ref, a_ref, b_ref, au_ref, bu_ref, ai_ref):
    """Grid (ntiles·NH, lx1), band b = lx1-1-r (descending).

    z_ref [1, 1, ly1, 8, 128] (band b) · ck_ref [1, 1, G1, 8, 128] (anchor
    row 8b+8 when (b+1)%bpc==0) · gout_ref [1, 8, 128] · dz_ref
    [1, ly1, 1, 8, 128] out · kbuf [3, G1, 8, 128] (three primal-row
    GENERATIONS: the dz stage trails the reconstruction by one row, so rows
    i+1, i, i−1 must coexist; generation slots are ``t mod 3`` with t the
    unrolled row index — static, as Mosaic requires for leading store
    indices) · gbuf [2, G2, 8, 128] (adjoint row parity; G2 = G1+M, the
    zero-padded tail doubles as the ĝ[·, >gy] = 0 boundary) · a/b the
    current band's coefficients · au/bu the band above's (for the top row's
    ĝ[i+1, ·] terms).

    Per row t, ONE fused cell loop advances three mutually independent
    recurrence chains — adjoint of row i (right-to-left), reconstruction of
    row i−1 (left-to-right), dz of row i−1's predecessor i.e. row i+0 of
    the previous iteration (throughput-only) — so the VPU issue slots that
    a single latency-bound chain leaves idle are filled by the other two
    (~2x over running the three stages as separate sweeps).
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
        # the carried band-top row was reconstructed as generation 8%3=2 by
        # the band above; at this band's t=0 it is row i, generation 0
        kbuf_ref[0] = kbuf_ref[2]

    a_ref[:], b_ref[:] = _coef(z_ref[0, 0])
    # per-cell reciprocal once per band: the reconstruction sweep would
    # otherwise issue a hardware divide per STEP (8 per cell, ~an order of
    # magnitude slower than multiply on the VPU)
    ai_ref[:] = 1.0 / a_ref[:]

    @pl.when(((b + 1) % bpc == 0) | (b == lx1 - 1))
    def _():
        # band-top anchor: primal row 8b+8 -> generation 0
        kbuf_ref[0] = ck_ref[0, 0]

    def dz_zero(w, c):
        dz_ref[0, 0, w] = jnp.zeros_like(dz_ref[0, 0, w])
        return c

    lax.fori_loop(0, ly1, dz_zero, 0)

    _bwd_rows_stable(
        ly1, r,
        lambda cc: z_ref[0, 0, cc],
        lambda cc: dz_ref[0, 0, cc],
        lambda cc, v: dz_ref.__setitem__((0, 0, cc), v),
        gout_ref, kbuf_ref, gbuf_ref, a_ref, b_ref, au_ref, bu_ref, ai_ref,
    )


def _bwd_rows_stable(ly1, r, z_at, dz_get, dz_set, gout_ref, kbuf_ref, gbuf_ref,
              a_ref, b_ref, au_ref, bu_ref, ai_ref):
    """The band's 8-row reverse sweep (see :func:`_bwd_kernel`). ``z_at(cc)``
    reads cell cc's scaled increment; ``dz_get``/``dz_set`` access the dz
    accumulator (an output block or a VMEM scratch row)."""
    # unrolled over the band's 8 rows, i = 8b+8 - t descending; t is a
    # Python int so every kbuf/gbuf leading store index is compile-time
    # static (traced leading store indices silently corrupt slot selection)
    for t in range(_M):
        par = t & 1         # ĝ[i] parity slot
        top = t == 0        # row i+1 lives in the band above
        kcur_s = t % 3      # primal row i
        knew_s = (t + 1) % 3  # reconstructed row i-1
        kdz_s = (t - 1) % 3   # dz stage: primal rows i+1 (t-1's "i") ...
        kdzu_s = t % 3        # ... and its row-below i (read-only here)

        kbuf_ref[knew_s, 0] = jnp.ones_like(kbuf_ref[0, 0])

        # ĝ[i,j] = a(i,j+1)·ĝ[i,j+1] + a(i+1,j)·ĝ[i+1,j] − b(i+1,j+1)·ĝ[i+1,j+1]
        # k[i-1,j] = (k[i,j] + k[i-1,j-1]·b)·a⁻¹ − k[i,j-1]
        # ∂k[i,j]/∂z = (l+u)(½+z/6) + c·z/6, weighted by ĝ[i,j]
        def fused_cell(cc, carry, par=par, top=top, kcur_s=kcur_s,
                       knew_s=knew_s, kdz_s=kdz_s, kdzu_s=kdzu_s, t=t):
            g_right, kdl = carry

            # ---- adjoint of row i at cell w_a (right-to-left) ------------
            w_a = ly1 - 1 - cc
            a_cur = a_ref[w_a]
            a_up = au_ref[w_a] if top else a_ref[w_a]
            b_up = bu_ref[w_a] if top else b_ref[w_a]
            wr = jnp.minimum(w_a + 1, ly1 - 1)
            a_cur_r = a_ref[wr]
            b_up_r = bu_ref[wr] if top else b_ref[wr]
            gup = gbuf_ref[1 - par, pl.ds(w_a * _M + 1, _M + 1)]  # row i+1
            gnews = [None] * _M
            for tt in range(_M - 1, -1, -1):
                a_r = a_cur_r if tt == _M - 1 else a_cur
                bu = b_up_r if tt == _M - 1 else b_up
                g = a_r * g_right + a_up * gup[tt] - bu * gup[tt + 1]
                if top and tt == _M - 1:
                    # dL/dk seed at (gx, gy), folded INTO the sweep so it
                    # reaches the nodes left of gy in the same row
                    g = g + jnp.where(
                        (r == 0) & (w_a == ly1 - 1), gout_ref[0], 0.0
                    )
                gnews[tt] = g
                g_right = g
            gbuf_ref[par, pl.ds(w_a * _M + 1, _M)] = jnp.stack(gnews)

            # ---- reconstruct primal row i-1 at cell cc (ascending) -------
            ai = ai_ref[cc]
            bb = b_ref[cc]
            kc = kbuf_ref[kcur_s, pl.ds(cc * _M, _M + 1)]  # row i, 8c..8c+8
            kouts = []
            for tt in range(_M):
                kdl = (kc[tt + 1] + kdl * bb) * ai - kc[tt]
                kouts.append(kdl)
            kbuf_ref[knew_s, pl.ds(cc * _M + 1, _M)] = jnp.stack(kouts)

            # ---- dz of the PREVIOUS iteration's row (pipelined) ----------
            # ∂k/∂z = (l+u)(½+z/6) + c·z/6 weighted by ĝ; z is constant
            # across the coarse cell's 8 fine columns, so the (½+z/6, z/6)
            # scaling hoists OUTSIDE the slot sum — two 8-vreg products +
            # two reductions + two scalar-vreg FMAs instead of four 8-vreg
            # products (~30% fewer vector ops in the heaviest chain)
            if t > 0:
                z = z_at(cc)
                g_here = gbuf_ref[1 - par, pl.ds(cc * _M + 1, _M)]
                kcur = kbuf_ref[kdz_s, pl.ds(cc * _M, _M)]
                up = kbuf_ref[kdzu_s, pl.ds(cc * _M + 1, _M)]
                corner = kbuf_ref[kdzu_s, pl.ds(cc * _M, _M)]
                s1 = jnp.sum(g_here * (kcur + up), axis=0)
                s2 = jnp.sum(g_here * corner, axis=0)
                t1 = z * (1.0 / 6.0)
                dz_set(cc, dz_get(cc) + (0.5 + t1) * s1 + t1 * s2)
            return g_right, kdl

        zero = jnp.zeros_like(gbuf_ref[0, 0])
        ones = jnp.ones_like(gbuf_ref[0, 0])
        lax.fori_loop(0, ly1, fused_cell, (zero, ones))

    # dz of the band's last row (t = 7 has no successor iteration)
    glast = (_M - 1) & 1
    klast = (_M - 1) % 3
    klastu = _M % 3

    def dz_last(cc, c):
        z = z_at(cc)
        g_here = gbuf_ref[glast, pl.ds(cc * _M + 1, _M)]
        kcur = kbuf_ref[klast, pl.ds(cc * _M, _M)]
        up = kbuf_ref[klastu, pl.ds(cc * _M + 1, _M)]
        corner = kbuf_ref[klastu, pl.ds(cc * _M, _M)]
        s1 = jnp.sum(g_here * (kcur + up), axis=0)
        s2 = jnp.sum(g_here * corner, axis=0)
        t1 = z * (1.0 / 6.0)
        dz_set(cc, dz_get(cc) + (0.5 + t1) * s1 + t1 * s2)
        return c

    lax.fori_loop(0, ly1, dz_last, 0)



def _bwd_rows_fast(ly1, r, z_at, dz_get, dz_set, rc_at, gout_ref, kbuf_ref,
              gbuf_ref, a_ref, b_ref, au_ref, bu_ref, bi_ref):
    """The band's 8-row reverse sweep in STAGGERED ROW PAIRS (see
    :func:`_bwd_kernel` for buffer shapes). ``z_at(cc)`` reads cell cc's
    scaled increment; ``dz_get``/``dz_set`` access the dz accumulator;
    ``rc_at(s)`` reads the band's stored right-edge anchor ``k[8b+s, gy]``.

    Per row, three chains share one right-to-left cell loop:

      adjoint  ĝ[i,j] = a(i,j+1)·ĝ[i,j+1] + a(i+1,j)·ĝ[i+1,j]
                         − b(i+1,j+1)·ĝ[i+1,j+1]
      primal   k[i-1,j-1] = ((k[i,j-1] + k[i-1,j])·a − k[i,j]) / b
               (the forward recurrence inverted toward −j, re-anchored at
               the stored right edge every row)
      dz       Σ_j ĝ[i,j]·((l+u)(½+z/6) + c·z/6), accumulated per coarse
               cell with the scalar weights hoisted outside the slot sum.

    The band's rows are processed in PAIRS (A = upper, B = A−1) with B one
    cell to the right of A in the same loop iteration: B's ĝ-above and
    primal-source windows are exactly A's previous-iteration outputs, so
    they hand off through ~18 loop-carried vregs instead of VMEM.  This
    (a) removes B's 18 slice-loads per cell and A's 16 stores (A's rows are
    consumed only by B — only B writes the buffers for the next pair), and
    (b) doubles the independent dependency chains per issue window (6 vs
    3).  z is constant along a band's COLUMN (all 8 rows share a cell's
    coefficients), which is what makes the pairing's handoff exact.
    Measured at the flagship MPC shape: 0.81 → 0.78 µs/pair — a small win,
    because the sweep is ALU-issue-bound and loads/stores dual-issue (see
    the module docstring's floor analysis).  Bit-exact with the unpaired
    layout (same op order within each chain).
    """
    gy = ly1 * _M
    ones = jnp.ones_like(gbuf_ref[0, 0])
    zero = jnp.zeros_like(gbuf_ref[0, 0])

    for p in range(_M // 2):
        tA = 2 * p                 # rows i_A = 8b+8-tA, i_B = i_A - 1
        topA = tA == 0             # A's row i_A+1 lives in the band above
        rd = 1 - (p & 1)           # slot holding ĝ[A+1] and k[A]
        wr_slot = p & 1            # slot receiving ĝ[B] and k[B-1]
        krA0 = rc_at(_M - 1 - tA)      # k[B, gy] — A's primal anchor
        krB0 = rc_at(_M - 2 - tA)      # k[B-1, gy] — B's primal anchor
        # B's cell loop writes slots 0..gy-1 of the new generation; the
        # next pair's kc load covers slot gy
        kbuf_ref[wr_slot, gy] = krB0

        def a_cell(cc, g_right, kr, a_cur_r, b_up_r,
                   topA=topA, rd=rd, first=(p == 0)):
            """Row A at cell cc: reads VMEM, returns register outputs.
            ``a_cur_r``/``b_up_r`` are cell cc+1's coefficients, carried
            from the previous (right-neighbour) iteration instead of
            reloaded — the sweep walks right-to-left, so they are exactly
            that iteration's ``a_cur``/``b_up``."""
            a_cur = a_ref[cc]
            b_up = bu_ref[cc] if topA else b_ref[cc]
            a_up = au_ref[cc] if topA else a_cur
            bi = bi_ref[cc]

            kc = kbuf_ref[rd, pl.ds(cc * _M, _M + 1)]        # k[A]
            gup = gbuf_ref[rd, pl.ds(cc * _M + 1, _M + 1)]   # ĝ[A+1]

            gnews = [None] * _M
            for tt in range(_M - 1, -1, -1):
                a_r = a_cur_r if tt == _M - 1 else a_cur
                bu = b_up_r if tt == _M - 1 else b_up
                g = a_r * g_right + a_up * gup[tt] - bu * gup[tt + 1]
                if topA and tt == _M - 1:
                    # dL/dk seed at (gx, gy), folded INTO the sweep so it
                    # reaches the nodes left of gy in the same row
                    g = g + jnp.where(
                        (r == 0) & (cc == ly1 - 1), gout_ref[0], 0.0
                    )
                gnews[tt] = g
                g_right = g

            kus = [None] * (_M + 1)      # k[B, 8c .. 8c+8]
            kus[_M] = kr
            for tt in range(_M - 1, -1, -1):
                kus[tt] = ((kc[tt] + kus[tt + 1]) * a_cur - kc[tt + 1]) * bi
            # left boundary of row B is exactly one (cuts the /b drift)
            kus[0] = jnp.where(cc == 0, ones, kus[0])

            z = z_at(cc)
            s1 = gnews[0] * (kc[0] + kus[1])
            s2 = gnews[0] * kus[0]
            for tt in range(1, _M):
                s1 = s1 + gnews[tt] * (kc[tt] + kus[tt + 1])
                s2 = s2 + gnews[tt] * kus[tt]
            t1 = z * (1.0 / 6.0)
            val = (0.5 + t1) * s1 + t1 * s2
            if first:
                dz_set(cc, val)
            else:
                dz_set(cc, dz_get(cc) + val)
            return gnews, kus, a_cur, b_up

        def b_cell(cc, g_right, kr, gupw, kcw, a_cur_r, b_cur_r,
                   wr_slot=wr_slot):
            """Row B at cell cc: ĝ-above (``gupw``, 9 regs), primal source
            (``kcw``, 9 regs), and the right-neighbour coefficients all come
            from previous iterations' registers."""
            a_cur = a_ref[cc]
            bi = bi_ref[cc]
            b_cur = b_ref[cc]

            gnews = [None] * _M
            for tt in range(_M - 1, -1, -1):
                a_r = a_cur_r if tt == _M - 1 else a_cur
                bu = b_cur_r if tt == _M - 1 else b_cur
                g = a_r * g_right + a_cur * gupw[tt] - bu * gupw[tt + 1]
                gnews[tt] = g
                g_right = g
            gbuf_ref[wr_slot, pl.ds(cc * _M + 1, _M)] = jnp.stack(gnews)

            kus = [None] * (_M + 1)      # k[B-1, 8c .. 8c+8]
            kus[_M] = kr
            for tt in range(_M - 1, -1, -1):
                kus[tt] = ((kcw[tt] + kus[tt + 1]) * a_cur - kcw[tt + 1]) * bi
            kus[0] = jnp.where(cc == 0, ones, kus[0])
            kbuf_ref[wr_slot, pl.ds(cc * _M, _M)] = jnp.stack(kus[:_M])

            z = z_at(cc)
            s1 = gnews[0] * (kcw[0] + kus[1])
            s2 = gnews[0] * kus[0]
            for tt in range(1, _M):
                s1 = s1 + gnews[tt] * (kcw[tt] + kus[tt + 1])
                s2 = s2 + gnews[tt] * kus[tt]
            t1 = z * (1.0 / 6.0)
            dz_set(cc, dz_get(cc) + (0.5 + t1) * s1 + t1 * s2)
            return gnews, kus, a_cur, b_cur

        # ---- pipeline fill: A alone at the rightmost cell ----------------
        # right-edge coefficient seeds replicate the old clamp (the values
        # multiply ĝ-terms that are zero beyond gy, so the clamp is inert)
        edge = jnp.int32(ly1 - 1)
        aA0 = a_ref[edge]
        bA0 = bu_ref[edge] if topA else b_ref[edge]
        gA, kA, aA_r, bA_r = a_cell(edge, zero, krA0, aA0, bA0)
        # carried registers: A's last cell outputs (ĝ[A] 8 + k[B] 8), the
        # edge nodes to their right (ĝ[A, 8(cc+2)+1] and k[B, 8(cc+1)+8]),
        # both rows' chain carries, and both rows' right-neighbour coeffs
        carry0 = (
            tuple(gA), zero,            # gnewsA, ĝ[A] first-node of cell+1
            tuple(kA[:_M]), krA0,       # kusA,  k[B, 8cc+8] = A's kr_in
            gA[0], kA[0],               # A chain carries (g_right, kr)
            zero, krB0,                 # B chain carries
            aA_r, bA_r,                 # A's cell cc+1 coefficients
            a_ref[edge], b_ref[edge],   # B's (first B cell is the edge)
        )

        def paired(w, carry):
            (gAp, gA_first, kAp, krA_in, gA_r, kA_r, gB_r, kB_r,
             aA_r, bA_r, aB_r, bB_r) = carry
            ccB = ly1 - w              # B's cell (= A's previous cell)
            ccA = ccB - 1
            gupw = list(gAp) + [gA_first]
            kcw = list(kAp) + [krA_in]
            gB, kB, aB2, bB2 = b_cell(ccB, gB_r, kB_r, gupw, kcw, aB_r, bB_r)
            gA2, kA2, aA2, bA2 = a_cell(ccA, gA_r, kA_r, aA_r, bA_r)
            return (
                tuple(gA2), gAp[0],
                tuple(kA2[:_M]), kA_r,
                gA2[0], kA2[0],
                gB[0], kB[0],
                aA2, bA2,
                aB2, bB2,
            )

        carry = lax.fori_loop(1, ly1, paired, carry0)
        # ---- drain: B alone at cell 0 ------------------------------------
        (gAp, gA_first, kAp, krA_in, _gA_r, _kA_r, gB_r, kB_r,
         _aA_r, _bA_r, aB_r, bB_r) = carry
        b_cell(jnp.int32(0), gB_r, kB_r, list(gAp) + [gA_first],
               list(kAp) + [krA_in], aB_r, bB_r)


def _bwd_rows_fast_bf16(ly1, r, zh_ref, zhu_ref, dz_ref, rc_at, gout_ref,
                        kbuf_ref, gbuf_ref):
    """bf16 DELTA-FORM variant of :func:`_bwd_rows_fast` (opt-in via
    ``SignatureKernel(grad_precision='bf16')``): all three chains carry the
    SMALL inter-row differences in packed bf16 — 2048 pairs per [16, 128]
    vreg, double the fp32 issue width.

    Why naive bf16 fails and delta form works: the recurrences compute
    values ≈ their neighbours plus O(z) increments with |z| ~ 1e-3 — far
    below bf16's quantum around 1.0 — so rounding the near-1 coefficients
    (or the cancelling sums) destroys the z-information entirely (measured
    ~0.8 relative error). Carrying the differences themselves keeps every
    bf16 quantity at full RELATIVE precision:

      adjoint   ρ[i,j] = ĝ[i,j] − ĝ[i+1,j]
                ρ[j] = ρ[j+1] + zh_r·ĝ[i+1,j+1] + zh_u·ĝ[i+1,j]
                ĝ[i,j] = ĝ[i+1,j] + ρ[j]
      primal    σ[j] = k[i−1,j] − k[i,j]   (re-anchored at the fp32
                σ[j−1] = σ[j] + zh·(k[i,j−1] + k[i,j])     right edge)
                k[i−1,j−1] = k[i,j−1] + σ[j−1]
      dz        Σ_j ĝ·(k[i,j−1] + k[i−1,j]),  ×0.5 at the fp32 upconvert

    First order in z: the dropped z² terms are ≤ z/3 ≈ 1e-3 relative —
    far below the scheme's own bf16 drift. Accuracy at the flagship MPC
    shape vs the fp64 oracle (tmp_sim study, committed in the accuracy
    doc): value/adjoint drift ~3-6%, dz ~5-7% — SVGD-gradient grade, NOT
    value grade; the forward (values, checkpoints, anchors) stays fp32.
    """
    bf = jnp.bfloat16
    gy = ly1 * _M
    zero = jnp.zeros_like(gbuf_ref[0, 0])
    for t in range(_M):
        par = t & 1
        top = t == 0
        kcur_s = t & 1
        knew_s = (t + 1) & 1
        kr0 = rc_at(_M - 1 - t).astype(bf)  # k[i-1, gy], fp32 anchor
        sig0 = kr0 - kbuf_ref[kcur_s, gy]   # σ[gy]
        kbuf_ref[knew_s, gy] = kr0

        def fused_cell(w, carry, par=par, top=top, kcur_s=kcur_s,
                       knew_s=knew_s, t=t):
            rho_c, sig_c = carry  # delta carries: ρ at node j+1, σ at node j+1
            cc = ly1 - 1 - w
            zh = zh_ref[cc]
            zhu = zhu_ref[cc] if top else zh
            wr = jnp.minimum(cc + 1, ly1 - 1)
            zh_r = zh_ref[wr]

            kc = kbuf_ref[kcur_s, pl.ds(cc * _M, _M + 1)]   # row i
            gup = gbuf_ref[1 - par, pl.ds(cc * _M + 1, _M + 1)]  # row i+1

            rho, sig = rho_c, sig_c
            gnews = [None] * _M
            kus = [None] * _M
            s1 = None
            for tt in range(_M - 1, -1, -1):
                z1 = zh_r if tt == _M - 1 else zh
                # adjoint delta
                rho = rho + z1 * gup[tt + 1] + zhu * gup[tt]
                if top and tt == _M - 1:
                    rho = rho + jnp.where(
                        (r == 0) & (cc == ly1 - 1),
                        gout_ref[0].astype(bf), zero,
                    )
                g = gup[tt] + rho
                gnews[tt] = g
                # primal delta + dz (m1 uses the INCOMING σ = σ[j])
                s = kc[tt] + kc[tt + 1]
                m1 = s + sig
                s1 = g * m1 if s1 is None else s1 + g * m1
                sig = sig + zh * s
                if tt == 0:
                    # left boundary of row i-1 is exactly one -> σ(0) = 0
                    sig = jnp.where(cc == 0, zero, sig)
                kus[tt] = kc[tt] + sig
            gbuf_ref[par, pl.ds(cc * _M + 1, _M)] = jnp.stack(gnews)
            kbuf_ref[knew_s, pl.ds(cc * _M, _M)] = jnp.stack(kus)

            val = s1.astype(jnp.float32) * 0.5
            if t == 0:
                dz_ref[cc] = val
            else:
                dz_ref[cc] = dz_ref[cc] + val
            return rho, sig

        lax.fori_loop(0, ly1, fused_cell, (zero, sig0))


# ---------------------------------------------------------------------------
# Fused-statics backward: recompute the static-Gram rows per band, run the
# reverse sweep with dz in VMEM, and pull dz back to path-tile gradients —
# neither z nor dz ever touches HBM.
# ---------------------------------------------------------------------------


def _fused_bwd_kernel(lx1, ly1, bpc,
                      xg0_ref, xg1_ref, yg_ref, rc_ref, ck_ref, gout_ref,
                      dxg_ref, dxg0_ref, dyg_ref,
                      kbuf_ref, gbuf_ref, a_ref, b_ref, au_ref, bu_ref,
                      bi_ref, zrow_ref, dz_ref, grow_ref, d2row_ref,
                      yn_ref, dgc_ref):
    """Grid (ntiles·NH, lx1), band b = lx1-1-r (descending).

    Statics: band b's increments need static-Gram rows b (computed here
    from ``xg0``) and b+1 (carried in ``grow_ref``/``d2row_ref`` from the
    band above — the first step computes both). After the reverse sweep,
    the accumulated dz row is pulled back through the double difference to
    ``dg`` rows b/b+1 and on to RBF path-tile gradients: row b+1's dg is
    complete once band b has contributed (``dgc_ref`` carries the pending
    half), so ``dxg`` row b+1 is emitted per band and row 0 at the end;
    ``dyg`` accumulates in its (constant-indexed) output block.
    """
    r = pl.program_id(1)
    b = lx1 - 1 - r
    C = yg_ref.shape[2]

    @pl.when(r == 0)
    def _():
        gbuf_ref[:] = jnp.zeros_like(gbuf_ref)
        au_ref[:] = jnp.zeros_like(au_ref)
        bu_ref[:] = jnp.zeros_like(bu_ref)
        _yn_init(yg_ref, yn_ref)
        gu0, d2u0 = _g_row(xg1_ref, yg_ref, yn_ref)  # g row lx1
        grow_ref[:] = gu0
        d2row_ref[:] = d2u0
        dgc_ref[:] = jnp.zeros_like(dgc_ref)
        dyg_ref[0] = jnp.zeros_like(dyg_ref[0])
        dxg0_ref[0, 0] = jnp.zeros_like(dxg0_ref[0, 0])

    @pl.when(r != 0)
    def _():
        au_ref[:] = a_ref[:]
        bu_ref[:] = b_ref[:]

    gl, d2l = _g_row(xg0_ref, yg_ref, yn_ref)  # g row b
    gu = grow_ref[:]                            # g row b+1 (carried)
    zrow_ref[:] = (gu[1:] - gu[:-1] - gl[1:] + gl[:-1]) * _ZS
    a_ref[:], b_ref[:] = _coef(zrow_ref[:])
    bi_ref[:] = 1.0 / b_ref[:]

    @pl.when(((b + 1) % bpc == 0) | (b == lx1 - 1))
    def _():
        # the paired sweep's first row-pair reads slot 1 (the previous
        # band's last pair writes slot 1, so the carry and the anchor agree)
        kbuf_ref[1] = ck_ref[0, 0]

    _bwd_rows_fast(
        ly1, r,
        lambda cc: zrow_ref[cc],
        lambda cc: dz_ref[cc],
        lambda cc, v: dz_ref.__setitem__(cc, v),
        lambda s: rc_ref[0, 0, s],
        gout_ref, kbuf_ref, gbuf_ref, a_ref, b_ref, au_ref, bu_ref, bi_ref,
    )

    # ---- statics pull-back for this band ----------------------------------
    # dg[b+1, j] = s·(dz[j-1] − dz[j]) =: e[j]; dg[b, j] gets −e[j] (carried)
    dz = dz_ref[:]
    e = jnp.concatenate([-dz[:1], dz[:-1] - dz[1:], dz[-1:]], axis=0) * _ZS
    dgu = dgc_ref[:] + e
    dd2 = jnp.where(d2row_ref[:] > 0.0, dgu * (-gu), 0.0)  # [Ly, 8, 128]
    sd = jnp.sum(dd2, axis=0)
    for c in range(C):
        yc = yg_ref[0, :, c]
        x1c = xg1_ref[0, 0, c]
        dxg_ref[0, 0, c] = 2.0 * (x1c * sd - jnp.sum(dd2 * yc, axis=0))
        dyg_ref[0, :, c] = dyg_ref[0, :, c] + 2.0 * (yc - x1c) * dd2
    dgc_ref[:] = -e
    grow_ref[:] = gl
    d2row_ref[:] = d2l

    @pl.when(r == lx1 - 1)
    def _():
        # g row 0: its dg has only band 0's −e contribution (the carry)
        dd20 = jnp.where(d2l > 0.0, dgc_ref[:] * (-gl), 0.0)
        sd0 = jnp.sum(dd20, axis=0)
        for c in range(C):
            yc = yg_ref[0, :, c]
            x0c = xg0_ref[0, 0, c]
            dxg0_ref[0, 0, c] = 2.0 * (x0c * sd0 - jnp.sum(dd20 * yc, axis=0))
            dyg_ref[0, :, c] = dyg_ref[0, :, c] + 2.0 * (yc - x0c) * dd20


def _fused_bwd_kernel_bf16(lx1, ly1, bpc,
                           xg0_ref, xg1_ref, yg_ref, rc_ref, ck_ref, gout_ref,
                           dxg_ref, dxg0_ref, dyg_ref,
                           kbuf_ref, gbuf_ref, zh_ref, zhu_ref, dz_ref,
                           grow_ref, d2row_ref, yn_ref, dgc_ref):
    """bf16 delta-form twin of :func:`_fused_bwd_kernel`. Grid (nt, lx1) on
    FULL [16, 128] tiles (the packed-bf16 sweep processes 2048 pairs per
    vreg, so the forward's tile needs no sublane split); statics, dz and the
    RBF pull-back stay fp32 — only the three per-cell recurrence chains and
    their row buffers are bf16."""
    r = pl.program_id(1)
    b = lx1 - 1 - r
    C = yg_ref.shape[2]

    @pl.when(r == 0)
    def _():
        gbuf_ref[:] = jnp.zeros_like(gbuf_ref)
        zhu_ref[:] = jnp.zeros_like(zhu_ref)
        _yn_init(yg_ref, yn_ref)
        gu0, d2u0 = _g_row(xg1_ref, yg_ref, yn_ref)  # g row lx1
        grow_ref[:] = gu0
        d2row_ref[:] = d2u0
        dgc_ref[:] = jnp.zeros_like(dgc_ref)
        dyg_ref[0] = jnp.zeros_like(dyg_ref[0])
        dxg0_ref[0, 0] = jnp.zeros_like(dxg0_ref[0, 0])

    @pl.when(r != 0)
    def _():
        zhu_ref[:] = zh_ref[:]

    gl, d2l = _g_row(xg0_ref, yg_ref, yn_ref)  # g row b
    gu = grow_ref[:]                            # g row b+1 (carried)
    z = (gu[1:] - gu[:-1] - gl[1:] + gl[:-1]) * _ZS
    zh_ref[:] = (z * 0.5).astype(jnp.bfloat16)

    @pl.when(((b + 1) % bpc == 0) | (b == lx1 - 1))
    def _():
        kbuf_ref[0] = ck_ref[0, 0].astype(jnp.bfloat16)

    _bwd_rows_fast_bf16(
        ly1, r,
        zh_ref, zhu_ref,
        dz_ref,
        lambda s: rc_ref[0, 0, s],
        gout_ref, kbuf_ref, gbuf_ref,
    )

    # ---- statics pull-back for this band (identical to the fp32 kernel) --
    dz = dz_ref[:]
    e = jnp.concatenate([-dz[:1], dz[:-1] - dz[1:], dz[-1:]], axis=0) * _ZS
    dgu = dgc_ref[:] + e
    dd2 = jnp.where(d2row_ref[:] > 0.0, dgu * (-gu), 0.0)
    sd = jnp.sum(dd2, axis=0)
    for c in range(C):
        yc = yg_ref[0, :, c]
        x1c = xg1_ref[0, 0, c]
        dxg_ref[0, 0, c] = 2.0 * (x1c * sd - jnp.sum(dd2 * yc, axis=0))
        dyg_ref[0, :, c] = dyg_ref[0, :, c] + 2.0 * (yc - x1c) * dd2
    dgc_ref[:] = -e
    grow_ref[:] = gl
    d2row_ref[:] = d2l

    @pl.when(r == lx1 - 1)
    def _():
        dd20 = jnp.where(d2l > 0.0, dgc_ref[:] * (-gl), 0.0)
        sd0 = jnp.sum(dd20, axis=0)
        for c in range(C):
            yc = yg_ref[0, :, c]
            x0c = xg0_ref[0, 0, c]
            dxg0_ref[0, 0, c] = 2.0 * (x0c * sd0 - jnp.sum(dd20 * yc, axis=0))
            dyg_ref[0, :, c] = dyg_ref[0, :, c] + 2.0 * (yc - x0c) * dd20


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
    """[B, lx1, ly1] -> [nt, lx1, ly1, S, 128] (+ original B, tile count).

    Pair-tile layout: the (S, 128) pair axes are MINOR, so every buffer the
    kernels stream is perfectly (8, 128)-tiled — no sublane/lane padding."""
    b, lx1, ly1 = x.shape
    nt = -(-b // _P)
    pad = nt * _P - b
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, lx1, ly1), x.dtype)])
    z = jnp.transpose(x.reshape(nt, _S, 128, lx1, ly1), (0, 3, 4, 1, 2))
    return z, b, nt


def _fwd_call(z, nt, lx1, ly1, with_ck):
    # no-grad path: one dummy checkpoint store at the top band only (bpc =
    # lx1) — pallas_call outputs cannot be DCE'd, so shrinking the slot count
    # and store frequency is what avoids streaming dead rows to HBM
    bpc = _bands_per_ck(lx1) if with_ck else lx1
    G1 = ly1 * _M + 1
    nslots = _n_ck_slots(lx1, bpc)
    kern = partial(_fwd_kernel, lx1, ly1, bpc)
    k, cks = pl.pallas_call(
        kern,
        grid=(nt, lx1),
        in_specs=[
            pl.BlockSpec((1, 1, ly1, _S, 128), lambda p, r: (p, r, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, _S, 128), lambda p, r: (p, 0, 0)),
            pl.BlockSpec((1, 1, G1, _S, 128), lambda p, r: (p, r // bpc, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nt, _S, 128), z.dtype),
            jax.ShapeDtypeStruct((nt, nslots, G1, _S, 128), z.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((G1 + _M, _S, 128), z.dtype),  # +M: garbage cell
            pltpu.VMEM((ly1, _S, 128), z.dtype),
            pltpu.VMEM((ly1, _S, 128), z.dtype),
        ],
        compiler_params=_params(),
        interpret=_interpret(),
    )(z)
    if with_ck:
        return k, cks
    return k


def _bwd_call(z, cks, g_out, nt, lx1, ly1):
    """The backward runs on [8, 128] half-tiles of the forward's [16, 128]
    arrays (its row buffers would not fit VMEM at [16, 128], and its three
    interleaved chains already cover the VPU latency): the pair-grid axis is
    ``nt·NH`` and every BlockSpec splits the sublane dimension by indexing
    half-blocks — no repacking pass over HBM."""
    bpc = _bands_per_ck(lx1)
    G1 = ly1 * _M + 1
    G2 = G1 + _M
    kern = partial(_bwd_kernel, lx1, ly1, bpc)

    def slot(r):
        # anchor bands ((b+1)%bpc==0 or the top band) load slot b//bpc;
        # other bands stream an arbitrary in-range block (unused)
        return (lx1 - 1 - r) // bpc

    dz = pl.pallas_call(
        kern,
        grid=(nt * _NH, lx1),
        in_specs=[
            pl.BlockSpec(
                (1, 1, ly1, 8, 128),
                lambda p, r: (p // _NH, lx1 - 1 - r, 0, p % _NH, 0),
            ),
            pl.BlockSpec(
                (1, 1, G1, 8, 128),
                lambda p, r: (p // _NH, slot(r), 0, p % _NH, 0),
            ),
            pl.BlockSpec((1, 8, 128), lambda p, r: (p // _NH, p % _NH, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, ly1, 8, 128),
            lambda p, r: (p // _NH, lx1 - 1 - r, 0, p % _NH, 0),
        ),
        out_shape=jax.ShapeDtypeStruct((nt, lx1, ly1, _S, 128), z.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, G1, 8, 128), z.dtype),
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


@jax.custom_vjp
def _solve_tiled(z: jax.Array) -> jax.Array:
    """PDE solve on pre-tiled scaled increments ``z [nt, lx1, ly1, S, 128]``
    → ``k [nt, S, 128]``. The custom-VJP boundary lives HERE, on the tile
    layout, so callers that can produce ``z`` directly (the streamed-Gram
    pipeline) never materialize a pair-major ``[B, lx1, ly1]`` grid."""
    nt, lx1, ly1 = z.shape[0], z.shape[1], z.shape[2]
    return _fwd_call(z, nt, lx1, ly1, with_ck=False)


def _tiled_fwd(z):
    # the differentiated path emits the checkpoint rows as RESIDUALS, so the
    # backward does not re-run the forward; under an outer jax.checkpoint
    # (the chunked-Gram pipeline) they are rematerialised at backward time
    # rather than stored, so peak memory is unchanged
    nt, lx1, ly1 = z.shape[0], z.shape[1], z.shape[2]
    k, cks = _fwd_call(z, nt, lx1, ly1, with_ck=True)
    return k, (z, cks)


def _tiled_bwd(res, g_out):
    z, cks = res
    nt, lx1, ly1 = z.shape[0], z.shape[1], z.shape[2]
    return (_bwd_call(z, cks, g_out, nt, lx1, ly1),)


_solve_tiled.defvjp(_tiled_fwd, _tiled_bwd)


def solve_goursat_pde_pallas(inc: jax.Array, dyadic_order: int) -> jax.Array:
    """Drop-in for :func:`sigkernel.solve_goursat_pde` at dyadic order 3:
    ``inc [B, lx1, ly1]`` coarse increments → ``[B]`` kernel values with a
    VMEM-resident custom adjoint. Runs in interpret mode off-TPU (so CPU
    tests exercise the same code). The pad/transpose into the pair-tile
    layout is plain XLA differentiated by AD; only the tiled solve carries
    the custom VJP."""
    assert dyadic_order == _LAM, "pallas solver is specialised to dyadic 3"
    z, b, _nt = _pad_pairs(inc / float(4**_LAM))
    return _solve_tiled(z).reshape(-1)[:b]


def _fused_fwd_call(xg, yg, with_ck):
    nt, lx1 = xg.shape[0], xg.shape[1] - 1
    ly = yg.shape[1]
    ly1 = ly - 1
    C = xg.shape[2]
    bpc = _bands_per_ck(lx1) if with_ck else lx1
    G1 = ly1 * _M + 1
    nslots = _n_ck_slots(lx1, bpc)
    kern = partial(_fused_fwd_kernel, lx1, ly1, bpc, with_ck)
    out_specs = [
        pl.BlockSpec((1, _S, 128), lambda p, r: (p, 0, 0)),
        pl.BlockSpec((1, 1, G1, _S, 128), lambda p, r: (p, r // bpc, 0, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((nt, _S, 128), xg.dtype),
        jax.ShapeDtypeStruct((nt, nslots, G1, _S, 128), xg.dtype),
    ]
    if with_ck:
        out_specs.append(
            pl.BlockSpec((1, 1, _M, _S, 128), lambda p, r: (p, r, 0, 0, 0))
        )
        out_shape.append(
            jax.ShapeDtypeStruct((nt, lx1, _M, _S, 128), xg.dtype)
        )
    out = pl.pallas_call(
        kern,
        grid=(nt, lx1),
        in_specs=[
            pl.BlockSpec((1, 1, C, _S, 128), lambda p, r: (p, r, 0, 0, 0)),
            pl.BlockSpec((1, 1, C, _S, 128), lambda p, r: (p, r + 1, 0, 0, 0)),
            pl.BlockSpec((1, ly, C, _S, 128), lambda p, r: (p, 0, 0, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((G1 + _M, _S, 128), xg.dtype),  # row (+garbage cell)
            pltpu.VMEM((ly1, _S, 128), xg.dtype),      # a
            pltpu.VMEM((ly1, _S, 128), xg.dtype),      # b
            pltpu.VMEM((ly, _S, 128), xg.dtype),       # grow (carried g row)
            pltpu.VMEM((ly, _S, 128), xg.dtype),       # yn
        ],
        compiler_params=_params(),
        interpret=_interpret(),
    )(xg, xg, yg)
    if with_ck:
        return out  # (k, cks, rcs)
    return out[0]


def _fused_bwd_call(xg, yg, cks, rcs, g_out):
    nt, lx1 = xg.shape[0], xg.shape[1] - 1
    ly = yg.shape[1]
    ly1 = ly - 1
    C = xg.shape[2]
    bpc = _bands_per_ck(lx1)
    G1 = ly1 * _M + 1
    G2 = G1 + _M
    kern = partial(_fused_bwd_kernel, lx1, ly1, bpc)

    def slot(r):
        # anchor bands ((b+1)%bpc==0 or the top band) load slot b//bpc;
        # other bands stream an arbitrary in-range block (unused)
        return (lx1 - 1 - r) // bpc

    dxg_rows, dxg0, dyg = pl.pallas_call(
        kern,
        grid=(nt * _NH, lx1),
        in_specs=[
            pl.BlockSpec(
                (1, 1, C, 8, 128),
                lambda p, r: (p // _NH, lx1 - 1 - r, 0, p % _NH, 0),
            ),
            pl.BlockSpec(
                (1, 1, C, 8, 128),
                lambda p, r: (p // _NH, lx1 - r, 0, p % _NH, 0),
            ),
            pl.BlockSpec(
                (1, ly, C, 8, 128), lambda p, r: (p // _NH, 0, 0, p % _NH, 0)
            ),
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
            # block row b holds the (complete) dX gradient of path row b+1
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
            jax.ShapeDtypeStruct((nt, lx1, C, _S, 128), xg.dtype),
            jax.ShapeDtypeStruct((nt, 1, C, _S, 128), xg.dtype),
            jax.ShapeDtypeStruct((nt, ly, C, _S, 128), xg.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, G1, 8, 128), xg.dtype),   # kbuf
            pltpu.VMEM((2, G2, 8, 128), xg.dtype),   # gbuf
            pltpu.VMEM((ly1, 8, 128), xg.dtype),     # a
            pltpu.VMEM((ly1, 8, 128), xg.dtype),     # b
            pltpu.VMEM((ly1, 8, 128), xg.dtype),     # au
            pltpu.VMEM((ly1, 8, 128), xg.dtype),     # bu
            pltpu.VMEM((ly1, 8, 128), xg.dtype),     # bi
            pltpu.VMEM((ly1, 8, 128), xg.dtype),     # zrow
            pltpu.VMEM((ly1, 8, 128), xg.dtype),     # dz
            pltpu.VMEM((ly, 8, 128), xg.dtype),      # grow
            pltpu.VMEM((ly, 8, 128), xg.dtype),      # d2row
            pltpu.VMEM((ly, 8, 128), xg.dtype),      # yn
            pltpu.VMEM((ly, 8, 128), xg.dtype),      # dgc
        ],
        compiler_params=_params(),
        interpret=_interpret(),
    )(xg, xg, yg, rcs, cks, g_out)
    return jnp.concatenate([dxg0, dxg_rows], axis=1), dyg


def _fused_bwd_call_bf16(xg, yg, cks, rcs, g_out):
    """bf16 delta-form backward launch: full-tile grid ``(nt, lx1)`` (no
    sublane split — the packed sweep covers 2048 pairs/vreg), checkpoints
    converted to bf16 on the XLA side so the streamed anchor blocks don't
    double the fp32 VMEM bill."""
    nt, lx1 = xg.shape[0], xg.shape[1] - 1
    ly = yg.shape[1]
    ly1 = ly - 1
    C = xg.shape[2]
    bpc = _bands_per_ck(lx1)
    G1 = ly1 * _M + 1
    G2 = G1 + _M
    kern = partial(_fused_bwd_kernel_bf16, lx1, ly1, bpc)
    cks16 = cks.astype(jnp.bfloat16)

    def slot(r):
        return (lx1 - 1 - r) // bpc

    dxg_rows, dxg0, dyg = pl.pallas_call(
        kern,
        grid=(nt, lx1),
        in_specs=[
            pl.BlockSpec((1, 1, C, _S, 128),
                         lambda p, r: (p, lx1 - 1 - r, 0, 0, 0)),
            pl.BlockSpec((1, 1, C, _S, 128),
                         lambda p, r: (p, lx1 - r, 0, 0, 0)),
            pl.BlockSpec((1, ly, C, _S, 128), lambda p, r: (p, 0, 0, 0, 0)),
            pl.BlockSpec((1, 1, _M, _S, 128),
                         lambda p, r: (p, lx1 - 1 - r, 0, 0, 0)),
            pl.BlockSpec((1, 1, G1, _S, 128),
                         lambda p, r: (p, slot(r), 0, 0, 0)),
            pl.BlockSpec((1, _S, 128), lambda p, r: (p, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, C, _S, 128),
                         lambda p, r: (p, lx1 - 1 - r, 0, 0, 0)),
            pl.BlockSpec((1, 1, C, _S, 128), lambda p, r: (p, 0, 0, 0, 0)),
            pl.BlockSpec((1, ly, C, _S, 128), lambda p, r: (p, 0, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nt, lx1, C, _S, 128), xg.dtype),
            jax.ShapeDtypeStruct((nt, 1, C, _S, 128), xg.dtype),
            jax.ShapeDtypeStruct((nt, ly, C, _S, 128), xg.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, G1, _S, 128), jnp.bfloat16),  # kbuf
            pltpu.VMEM((2, G2, _S, 128), jnp.bfloat16),  # gbuf
            pltpu.VMEM((ly1, _S, 128), jnp.bfloat16),    # zh (current band)
            pltpu.VMEM((ly1, _S, 128), jnp.bfloat16),    # zh (band above)
            pltpu.VMEM((ly1, _S, 128), jnp.float32),     # dz
            pltpu.VMEM((ly, _S, 128), jnp.float32),      # grow
            pltpu.VMEM((ly, _S, 128), jnp.float32),      # d2row
            pltpu.VMEM((ly, _S, 128), jnp.float32),      # yn
            pltpu.VMEM((ly, _S, 128), jnp.float32),      # dgc
        ],
        compiler_params=_params(),
        interpret=_interpret(),
    )(xg, xg, yg, rcs, cks16, g_out)
    return jnp.concatenate([dxg0, dxg_rows], axis=1), dyg


@jax.custom_vjp
def _fused_tiled(xg: jax.Array, yg: jax.Array) -> jax.Array:
    """PDE solve on pre-scaled path tiles ``xg [nt, Lx, C, S, 128]``,
    ``yg [nt, Ly, C, S, 128]`` (coordinates pre-multiplied by rsqrt(h)) →
    ``k [nt, S, 128]``. RBF statics and the increment double-difference are
    computed per band INSIDE the kernels: neither the [·, L, L] static Gram
    nor the increment grid z (nor, backward, dz) ever touches HBM — the
    only O(pairs) residual is the checkpoint rows."""
    return _fused_fwd_call(xg, yg, with_ck=False)


def _fused_tiled_fwd(xg, yg):
    k, cks, rcs = _fused_fwd_call(xg, yg, with_ck=True)
    return k, (xg, yg, cks, rcs)


def _fused_tiled_bwd(res, g_out):
    xg, yg, cks, rcs = res
    return _fused_bwd_call(xg, yg, cks, rcs, g_out)


_fused_tiled.defvjp(_fused_tiled_fwd, _fused_tiled_bwd)


@jax.custom_vjp
def _fused_tiled_bf16grad(xg: jax.Array, yg: jax.Array) -> jax.Array:
    """Same VALUES as :func:`_fused_tiled` (the fp32 forward is shared);
    the VJP runs the packed-bf16 delta-form adjoint — ~5-7% gradient error
    (SVGD-grade, see the accuracy study) at roughly half the backward
    wall-clock. Select via ``SignatureKernel(grad_precision='bf16')``."""
    return _fused_fwd_call(xg, yg, with_ck=False)


def _fused_tiled_bf16grad_fwd(xg, yg):
    k, cks, rcs = _fused_fwd_call(xg, yg, with_ck=True)
    return k, (xg, yg, cks, rcs)


def _fused_tiled_bf16grad_bwd(res, g_out):
    xg, yg, cks, rcs = res
    return _fused_bwd_call_bf16(xg, yg, cks, rcs, g_out)


_fused_tiled_bf16grad.defvjp(_fused_tiled_bf16grad_fwd, _fused_tiled_bf16grad_bwd)


def fused_supported(lx1: int, ly1: int, dyadic_order: int, n_channels: int,
                    static: str, h, grad_precision: str = "fp32") -> bool:
    # channel bound: yg + its dyg accumulator + the carried static rows add
    # ~(2C+6) [Ly, 8, 128] buffers to the backward's VMEM bill; C ≤ 8 keeps
    # the total under ~13 MB at ly1 = 48.  The bf16 backward runs on FULL
    # [16, 128] tiles — its fp32 statics/dz/yg/dyg buffers and streamed
    # blocks double relative to the half-tile fp32 route (~19 MB at ly1=48,
    # C=8), so its envelope is tightened to ly1 ≤ 40, C ≤ 4 (~12.5 MB at
    # the bound; the flagship MPC shape is ly1=39, C=2) — ADVICE r3.
    if not (
        pallas_supported(lx1, ly1, dyadic_order)
        and static == "rbf"
        and h is not None
        and n_channels <= 8
    ):
        return False
    if grad_precision == "bf16":
        return ly1 <= 40 and n_channels <= 4
    return True


def pallas_pair_gram_fused(X, Y, ix, iy, h, grad_precision: str = "fp32") -> jax.Array:
    """Fused-statics signature-kernel values for a pair list (RBF statics).

    Same contract as :func:`pallas_pair_values` (``P % 2048 == 0``; padded
    pairs use index 0 and zero cotangents), but the static Gram and the
    increment double-difference move INSIDE the Pallas kernels: the XLA
    side only gathers and tiles the rsqrt(h)-scaled paths, so the per-pair
    HBM traffic drops from O(L²) floats (z forward + dz backward) to O(L·C)
    path tiles + O(G) checkpoint rows. Differentiable w.r.t. X, Y and h
    (h via the pre-scale: ‖(x−y)/√h‖² ≡ ‖x−y‖²/h exactly)."""
    nt = ix.shape[0] // _P
    scale = lax.rsqrt(h).astype(X.dtype)
    Xs = X * scale
    Ys = Y * scale

    def tile(paths, idx):
        g = paths[idx]  # [P, L, C]
        g = g.reshape(nt, _S, 128, paths.shape[1], paths.shape[2])
        return jnp.transpose(g, (0, 3, 4, 1, 2))

    solve = _fused_tiled_bf16grad if grad_precision == "bf16" else _fused_tiled
    return solve(tile(Xs, ix), tile(Ys, iy)).reshape(-1)


def pallas_pair_values(X, Y, ix, iy, h) -> jax.Array:
    """Signature-kernel values for a pair list, statics in tile layout.

    ``X [n, L, C]``, ``Y [m, L, C]``, ``ix/iy [P]`` with ``P % 2048 == 0``
    (pad with index 0 — padded outputs are sliced off by the caller, so their
    cotangents are zero and the padded pairs contribute no gradient).

    Why this exists: the generic streamed-Gram path builds ``[P, L, L]``
    static-Gram tensors whose trailing dims tile to (8, 128) — a 41×41 grid
    pads to 48×128, a 3.7× HBM bloat — and then transposes the ``[P, lx1,
    ly1]`` increment grid into the kernel's tile layout (another ~2×G² pass
    over HBM). Here the 2048-pair tile axes are MINOR from the start: every
    intermediate is perfectly tiled, the increment grid is produced directly
    in the layout the Pallas kernels stream, and XLA fuses the cross-term /
    exp / double-difference chain into the single ``z`` materialization.
    Measured at the flagship MPC shape this removes ~40% of the wall-clock
    around the PDE kernel itself."""
    nt = ix.shape[0] // _P

    def tile(paths, idx):
        g = paths[idx]  # [P, L, C]
        g = g.reshape(nt, _S, 128, paths.shape[1], paths.shape[2])
        return jnp.transpose(g, (0, 3, 4, 1, 2))

    xg = tile(X, ix)  # [nt, Lx, C, S, 128]
    yg = tile(Y, iy)
    cross = sum(
        xg[:, :, None, c] * yg[:, None, :, c] for c in range(X.shape[2])
    )
    if h is None:
        g = cross
    else:
        xn = jnp.sum(xg * xg, axis=2)  # [nt, L, S, 128]
        yn = jnp.sum(yg * yg, axis=2)
        d2 = jnp.maximum(xn[:, :, None] + yn[:, None, :] - 2.0 * cross, 0.0)
        g = jnp.exp(-d2 / h)
    inc = g[:, 1:, 1:] - g[:, 1:, :-1] - g[:, :-1, 1:] + g[:, :-1, :-1]
    return _solve_tiled(inc / float(4**_LAM)).reshape(-1)
