"""Block-structured λ=0 signature-kernel Gram+gradient Pallas kernel.

Why this exists (round-5, VERDICT r4 item 1): the pair-list λ=0 kernel
(``pallas_sigkernel_small.py``) is fast in-kernel (~32 ms at the flagship
shape) but the e2e Gram+adjoint cost 94-105 ms because ~2/3 of the time was
the LAYER AROUND it — gathering 2×168 MB of per-pair path tiles, the
[P, L, C] → [nt, L, C, 16, 128] transposes, the 500k-pair scatter-add in the
gather's VJP, and a 6.6 GB ``dzfac`` residual round trip
(``results/lambda0_profile_r5.json``).

This kernel removes that layer by exploiting the OUTER-PRODUCT structure of
a symmetric Gram: tile the pair grid into [16 row-particles × 128
col-particles] blocks, with row particles on SUBLANES and col particles on
LANES. A [16, 128] vector op then covers 2048 pairs — same arithmetic
density as the pair-list layout — but the per-tile HBM traffic is the
16-path x block (8 KB) + 128-path y block (164 KB) instead of 2048 gathered
pair copies, and the gradients reduce IN-KERNEL (lane-sum → dX rows,
sublane-sum → dY cols) so the host side is a 288-segment add, not a
500k-pair scatter.

One program per tile runs the whole thing with NO inter-pass residuals:

  * statics: RBF static-Gram rows from the resident (pre-scaled) paths,
    expand form ``g = exp(x'·y' − ½‖x'‖² − ½‖y'‖²)`` with ``x' = x·√(2/h)``;
  * forward: row-by-row Goursat sweep (reference FD scheme, dyadic 0),
    checkpointing the K node row every ``R`` rows into VMEM;
  * backward: bands of ``R`` rows, top-down. Each band re-runs the forward
    from its checkpoint (bit-identical remat — same op order) into a VMEM
    band buffer, then sweeps the adjoint rows down through it. ``dzfac`` is
    formed from the rematerialised K rows as full-row vector ops; the
    static-Gram pull-back accumulates dX (lane-reduced per row) and dY
    (VMEM accumulator, sublane-reduced once at the end).

Triangle handling: tiles with ``I < 8J`` are strictly upper — each pair
stands for itself and its transpose, cotangent seed 2. Tiles on the
128×128 block diagonal contain both orders of every in-block pair, seed 1.
Strictly-lower tiles are skipped; the host assembles ``K = C + Cᵀ∘L`` where
``L`` masks the skipped block-lower region. Seeds and the n-boundary
padding mask are folded into one per-tile ``[16, 128]`` mask-seed input
applied to ``dz``.

Reference semantics: identical FD scheme to the reference's ``sigkernel``
dependency (``/root/reference/src/kernels/_traj_kernels.py:198-206``) at
``dyadic_order=0``; consumed by ``SignatureKernel.gram_and_grad`` — the
quantity TrajectorySVGD needs (``trajectory_svgd.py:55-69``). Validated
against the fp64/wavefront oracles in ``tests/test_pallas_block.py``.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sigkernel import _interpret

_SB = 16   # row particles per tile (sublanes)
_LB = 128  # col particles per tile (lanes)
_I6 = 1.0 / 6.0
_I12 = 1.0 / 12.0


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pick_r(lx1: int) -> int:
    return min(8, lx1)


def _vmem_bytes(L: int, C: int, R: int) -> int:
    """Scratch bytes of the fused gram+grad kernel (joint L·C bound —
    ADVICE r4 item 4 applied to this kernel's envelope up front)."""
    row = L * _SB * _LB * 4          # one [L, 16, 128] fp32 row buffer
    ly1row = (L - 1) * _SB * _LB * 4
    nck = max(1, _cdiv(L - 1, R) - 1)
    return (
        2 * row                       # ynh, krow
        + 2 * ly1row                  # a, b
        + nck * row                   # checkpoints
        + 2 * (R + 1) * row           # K band + g band
        + 4 * row                     # lambda x2, dg x2
        + C * row                     # dY accumulator
    )


def block_supported(n: int, L: int, C: int, static: str, h) -> bool:
    """Symmetric-Gram shapes the block kernel accepts. ``L·C ≤ 128`` keeps
    the x row block on one lane tile; the VMEM bound keeps the band/ckpt
    scratch under ~12 MB of the ~16 MB core budget."""
    return (
        static == "rbf"
        and h is not None
        and 2 <= L
        and 1 <= C <= 8
        and L * C <= 128
        and n >= 2
        and _vmem_bytes(L, C, _pick_r(L - 1)) <= 12 * 2**20
    )


def _tile_lists(n_pad: int):
    """Static (numpy) tile index lists for the block-triangle schedule."""
    nI, nJ = n_pad // _SB, n_pad // _LB
    I, J = [], []
    for j in range(nJ):
        for i in range(min(nI, 8 * j + 8)):
            I.append(i)
            J.append(j)
    I = np.asarray(I, np.int32)
    J = np.asarray(J, np.int32)
    seed = np.where(I < 8 * J, 2.0, 1.0).astype(np.float32)
    return I, J, seed


def _mask_seed_blocks(n: int, I: np.ndarray, J: np.ndarray, seed: np.ndarray):
    """[T, 16, 128] mask·seed blocks zeroing pairs that touch padding."""
    rows = I[:, None] * _SB + np.arange(_SB)[None, :]       # [T, 16]
    cols = J[:, None] * _LB + np.arange(_LB)[None, :]       # [T, 128]
    m = (rows[:, :, None] < n) & (cols[:, None, :] < n)
    return (m * seed[:, None, None]).astype(np.float32)


# ---------------------------------------------------------------------------
# Kernel body.
# ---------------------------------------------------------------------------


def _statics_row(xb_ref, yb_ref, ynh_ref, i: int, C: int):
    """Static-Gram row ``g[i] [L, 16, 128]`` for path point row ``i``:
    ``exp(Σ_c x'[s,i,c]·y'[t,c,l] − ½‖x'[s,i]‖² − ½‖y'[t,l]‖²)`` over the
    16×128 particle pairs (s, l)."""
    xc0 = xb_ref[0, :, i * C: i * C + 1]          # [16, 1]
    xm = xc0 * xc0
    cross = xc0[None] * yb_ref[0, :, 0, :][:, None, :]
    for c in range(1, C):
        xc = xb_ref[0, :, i * C + c: i * C + c + 1]
        xm = xm + xc * xc
        cross = cross + xc[None] * yb_ref[0, :, c, :][:, None, :]
    return jnp.exp(cross + (ynh_ref[:] - 0.5 * xm[None]))


def _fill_ynh(yb_ref, ynh_ref, C: int):
    yn = yb_ref[0, :, 0, :] * yb_ref[0, :, 0, :]
    for c in range(1, C):
        yn = yn + yb_ref[0, :, c, :] * yb_ref[0, :, c, :]
    ynh_ref[:] = jnp.broadcast_to(
        -0.5 * yn[:, None, :], ynh_ref.shape
    )


def _coefs(gl, gu, a_ref, b_ref):
    """Cell coefficients from g rows i (gl) and i+1 (gu); returns z."""
    z = gu[1:] - gu[:-1] - gl[1:] + gl[:-1]       # [ly1, 16, 128]
    a_ref[:] = 1.0 + z * (0.5 + z * _I12)
    b_ref[:] = 1.0 - z * z * _I12
    return z


def _sweep_row(krow_ref, a_ref, b_ref, ly1: int):
    """Advance the K node row through one cell row (serial in j).

    ``fori_loop`` with dynamic slot indices, NOT a Python unroll: unrolled,
    Mosaic hoists every ``a[j]``/``b[j]`` slice load into one live range and
    the kernel's scoped-VMEM stack blows past the 16 MB core budget (45 MB
    measured at the flagship shape)."""
    ones = jnp.ones_like(krow_ref[0])

    def body(j, carry):
        kl, prev = carry
        old = krow_ref[pl.ds(j + 1, 1)][0]
        kn = (kl + old) * a_ref[pl.ds(j, 1)][0] - prev * b_ref[pl.ds(j, 1)][0]
        krow_ref[pl.ds(j + 1, 1)] = kn[None]
        return kn, old

    lax.fori_loop(0, ly1, body, (ones, krow_ref[0]))


def _lam_chain(lamc_ref, a_ref, ly1: int):
    """Complete the adjoint node row i+1 right-to-left (serial in j):
    λ[j] ← λ_partial[j] + a[j]·λ[j+1]. fori form for the same scoped-VMEM
    reason as :func:`_sweep_row`."""

    def body(k, lam_right):
        j = ly1 - 1 - k
        lam_right = lamc_ref[pl.ds(j, 1)][0] \
            + lam_right * a_ref[pl.ds(j, 1)][0]
        lamc_ref[pl.ds(j, 1)] = lam_right[None]
        return lam_right

    lax.fori_loop(0, ly1, body, lamc_ref[ly1])


def _block_kernel(L, C, R, xb_ref, yb_ref, ms_ref, k_ref, dxr_ref, dyc_ref,
                  ynh_ref, krow_ref, a_ref, b_ref, ck_ref, kb_ref, gb_ref,
                  lam0_ref, lam1_ref, dg0_ref, dg1_ref, dya_ref):
    """One Gram tile: forward + checkpoint, banded-remat adjoint, fused
    static-Gram pull-back. See module docstring."""
    ly1 = L - 1
    lx1 = L - 1
    n_bands = _cdiv(lx1, R)
    g_row = partial(_statics_row, xb_ref, yb_ref, ynh_ref, C=C)

    _fill_ynh(yb_ref, ynh_ref, C)

    # ---- forward pass: K node rows bottom-up, checkpoints every R rows ----
    krow_ref[:] = jnp.ones_like(krow_ref)
    gl = g_row(0)
    for i in range(lx1):
        gu = g_row(i + 1)
        _coefs(gl, gu, a_ref, b_ref)
        _sweep_row(krow_ref, a_ref, b_ref, ly1)
        gl = gu
        if (i + 1) % R == 0 and (i + 1) < lx1:
            ck_ref[(i + 1) // R - 1] = krow_ref[:]
    k_ref[0] = krow_ref[ly1]

    # ---- adjoint: bands top-down, remat forward inside each band ----------
    lam0_ref[:] = jnp.zeros_like(lam0_ref)
    lam0_ref[ly1] = jnp.ones_like(lam0_ref[0])    # seed folded into ms
    dg0_ref[:] = jnp.zeros_like(dg0_ref)
    dya_ref[:] = jnp.zeros_like(dya_ref)

    lam_c, lam_n = lam0_ref, lam1_ref             # complete(i+1) / fresh(i)
    dg_u, dg_f = dg0_ref, dg1_ref                 # row i+1 / fresh row i

    for b in range(n_bands - 1, -1, -1):
        bs, be = b * R, min(b * R + R, lx1)
        nb = be - bs
        # remat: g rows bs..be and K node rows bs..be into the band buffers
        for l in range(nb + 1):
            gb_ref[l] = g_row(bs + l)
        if bs == 0:
            krow_ref[:] = jnp.ones_like(krow_ref)
        else:
            krow_ref[:] = ck_ref[bs // R - 1]
        kb_ref[0] = krow_ref[:]
        for l in range(nb):
            _coefs(gb_ref[l], gb_ref[l + 1], a_ref, b_ref)
            _sweep_row(krow_ref, a_ref, b_ref, ly1)
            kb_ref[l + 1] = krow_ref[:]
        # adjoint rows top-down through the band
        for l in range(nb - 1, -1, -1):
            z = _coefs(gb_ref[l], gb_ref[l + 1], a_ref, b_ref)
            _lam_chain(lam_c, a_ref, ly1)
            lam1a = lam_c[1:]                     # λ_{i+1, j+1}, complete
            lam_n[1:] = lam1a * a_ref[:]
            lam_n[0] = jnp.zeros_like(lam_n[0])
            lam_n[:ly1] = lam_n[:ly1] - lam1a * b_ref[:]
            fac = (kb_ref[l + 1][:ly1] + kb_ref[l][1:]) * (0.5 + z * _I6) \
                + kb_ref[l][:ly1] * (z * _I6)
            dz = lam1a * fac * ms_ref[0][None]
            dg_u[1:] = dg_u[1:] + dz
            dg_u[:ly1] = dg_u[:ly1] - dz
            dg_f[1:] = -dz
            dg_f[0] = jnp.zeros_like(dg_f[0])
            dg_f[:ly1] = dg_f[:ly1] + dz
            _pullback_row(xb_ref, yb_ref, dxr_ref, dya_ref,
                          dg_u[:] * gb_ref[l + 1], bs + l + 1, C)
            lam_c, lam_n = lam_n, lam_c
            dg_u, dg_f = dg_f, dg_u

    # dg row 0 (in dg_u after the final swap) → dX row 0; flush dY
    _pullback_row(xb_ref, yb_ref, dxr_ref, dya_ref, dg_u[:] * gb_ref[0], 0, C)
    for t in range(L):
        for c in range(C):
            dyc_ref[0, t * C + c: t * C + c + 1] = jnp.sum(
                dya_ref[t, c], axis=0, keepdims=True
            )


def _pullback_row(xb_ref, yb_ref, dxr_ref, dya_ref, w, i, C):
    """Pull the finalised dg row ``i`` back through the static Gram
    (``w = dg∘g [L, 16, 128]``): dX'[s,i,c] = Σ_lanes Σ_t w·(y'−x')
    lane-reduced per row, dY'[t,c,l] accumulates Σ_rows w·(x'−y')
    (sublane-reduced once at the tile end)."""
    swl = jnp.sum(jnp.sum(w, axis=0), axis=-1, keepdims=True)    # [16, 1]
    for c in range(C):
        xc = xb_ref[0, :, i * C + c: i * C + c + 1]              # [16, 1]
        q = w * yb_ref[0, :, c, :][:, None, :]                   # [L, 16, 128]
        ql = jnp.sum(jnp.sum(q, axis=0), axis=-1, keepdims=True)
        dxr_ref[0, :, i * C + c: i * C + c + 1] = ql - xc * swl
        dya_ref[:, c] = dya_ref[:, c] + (w * xc[None] - q)


def _block_values_kernel(L, C, xb_ref, yb_ref, k_ref, ynh_ref, krow_ref,
                         a_ref, b_ref):
    """Values-only tile: forward sweep, no checkpoints/adjoint."""
    ly1 = L - 1
    g_row = partial(_statics_row, xb_ref, yb_ref, ynh_ref, C=C)
    _fill_ynh(yb_ref, ynh_ref, C)
    krow_ref[:] = jnp.ones_like(krow_ref)
    gl = g_row(0)
    for i in range(L - 1):
        gu = g_row(i + 1)
        _coefs(gl, gu, a_ref, b_ref)
        _sweep_row(krow_ref, a_ref, b_ref, ly1)
        gl = gu
    k_ref[0] = krow_ref[ly1]


# ---------------------------------------------------------------------------
# Host wrappers.
# ---------------------------------------------------------------------------


def _prep_blocks(X: jax.Array, h: jax.Array):
    """Pad, prescale and slice X into per-tile row/col blocks."""
    n, L, C = X.shape
    n_pad = _cdiv(n, _LB) * _LB
    nI, nJ = n_pad // _SB, n_pad // _LB
    I, J, seed = _tile_lists(n_pad)
    Xp = jnp.zeros((n_pad, L, C), X.dtype).at[:n].set(X)
    scale = jnp.sqrt(2.0 / h).astype(X.dtype)
    Xs = Xp * scale
    xb = Xs.reshape(nI, _SB, L * C)[I]                       # [T, 16, LC]
    yb = jnp.transpose(Xs, (1, 2, 0)).reshape(L, C, nJ, _LB)
    yb = jnp.transpose(yb, (2, 0, 1, 3))[J]                  # [T, L, C, 128]
    return n_pad, nI, nJ, I, J, seed, scale, xb, yb


def _assemble_k(k_t, n, n_pad, nI, nJ, I, J, dtype):
    Ksq = jnp.zeros((nI, nJ, _SB, _LB), dtype).at[I, J].set(k_t)
    Kfull = jnp.transpose(Ksq, (0, 2, 1, 3)).reshape(n_pad, n_pad)[:n, :n]
    bi = np.arange(n) // _LB
    lower = jnp.asarray(bi[:, None] > bi[None, :])
    return jnp.where(lower, Kfull.T, Kfull)


def block_gram(X: jax.Array, h: jax.Array) -> jax.Array:
    """Symmetric signature-kernel Gram ``K [n, n]`` (values only)."""
    n, L, C = X.shape
    n_pad, nI, nJ, I, J, _seed, _scale, xb, yb = _prep_blocks(X, h)
    T = I.shape[0]
    kern = partial(_block_values_kernel, L, C)
    row = (L, _SB, _LB)
    k_t = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, _SB, L * C), lambda p: (p, 0, 0)),
            pl.BlockSpec((1, L, C, _LB), lambda p: (p, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, _SB, _LB), lambda p: (p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, _SB, _LB), X.dtype),
        scratch_shapes=[
            pltpu.VMEM(row, X.dtype),                # ynh
            pltpu.VMEM(row, X.dtype),                # krow
            pltpu.VMEM((L - 1, _SB, _LB), X.dtype),  # a
            pltpu.VMEM((L - 1, _SB, _LB), X.dtype),  # b
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.GridDimensionSemantics.PARALLEL,)
        ),
        interpret=_interpret(),
    )(xb, yb)
    return _assemble_k(k_t, n, n_pad, nI, nJ, I, J, X.dtype)


def _block_call(X: jax.Array, h: jax.Array, xb, yb, ms):
    """Invoke the fused gram+grad kernel on an explicit tile batch.

    ``xb [T, 16, L·C]`` / ``yb [T, L, C, 128]`` are per-tile row/col path
    blocks (pre-scaled), ``ms [T, 16, 128]`` the per-tile mask·seed. Returns
    the raw per-tile outputs ``(k_t, dxr, dyc)``. Used directly by the
    sharded tile-subset route (``block_tiles_partial``) and via
    :func:`block_gram_and_grad` for the full single-device schedule."""
    n, L, C = X.shape
    T = xb.shape[0]
    lx1 = L - 1
    R = _pick_r(lx1)
    nck = max(1, _cdiv(lx1, R) - 1)
    kern = partial(_block_kernel, L, C, R)
    row = (L, _SB, _LB)
    k_t, dxr, dyc = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, _SB, L * C), lambda p: (p, 0, 0)),
            pl.BlockSpec((1, L, C, _LB), lambda p: (p, 0, 0, 0)),
            pl.BlockSpec((1, _SB, _LB), lambda p: (p, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, _SB, _LB), lambda p: (p, 0, 0)),
            pl.BlockSpec((1, _SB, L * C), lambda p: (p, 0, 0)),
            pl.BlockSpec((1, L * C, _LB), lambda p: (p, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, _SB, _LB), X.dtype),
            jax.ShapeDtypeStruct((T, _SB, L * C), X.dtype),
            jax.ShapeDtypeStruct((T, L * C, _LB), X.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM(row, X.dtype),             # ynh
            pltpu.VMEM(row, X.dtype),             # krow
            pltpu.VMEM((lx1, _SB, _LB), X.dtype),  # a
            pltpu.VMEM((lx1, _SB, _LB), X.dtype),  # b
            pltpu.VMEM((nck,) + row, X.dtype),    # checkpoints
            pltpu.VMEM((R + 1,) + row, X.dtype),  # K band
            pltpu.VMEM((R + 1,) + row, X.dtype),  # g band
            pltpu.VMEM(row, X.dtype),             # lambda (complete)
            pltpu.VMEM(row, X.dtype),             # lambda (fresh)
            pltpu.VMEM(row, X.dtype),             # dg row i+1
            pltpu.VMEM(row, X.dtype),             # dg fresh
            pltpu.VMEM((L, C, _SB, _LB), X.dtype),  # dY accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.GridDimensionSemantics.PARALLEL,)
        ),
        interpret=_interpret(),
    )(xb, yb, ms)
    return k_t, dxr, dyc


def block_gram_and_grad(X: jax.Array, h: jax.Array):
    """Symmetric signature-kernel Gram and full-sum pull-back gradient.

    Returns ``(K [n, n], dX [n, L, C])`` with ``dX = ½·∂Σ_{jl}K/∂X`` — the
    detached-second-argument repulsion gradient ``gram_and_grad`` returns
    (``sigkernel.py``; reference semantics ``trajectory_svgd.py:55-69``).
    Not differentiable further — consumed as data by the Stein velocity.
    """
    n, L, C = X.shape
    n_pad, nI, nJ, I, J, seed, scale, xb, yb = _prep_blocks(X, h)
    ms = jnp.asarray(_mask_seed_blocks(n, I, J, seed))
    k_t, dxr, dyc = _block_call(X, h, xb, yb, ms)

    # ---- assembly -------------------------------------------------------
    K = _assemble_k(k_t, n, n_pad, nI, nJ, I, J, X.dtype)
    dXrow = (
        jnp.zeros((nI, _SB, L * C), X.dtype).at[I].add(dxr)
        .reshape(n_pad, L, C)
    )
    dYcol = jnp.zeros((nJ, L * C, _LB), X.dtype).at[J].add(dyc)
    dYcol = jnp.transpose(dYcol, (0, 2, 1)).reshape(n_pad, L, C)
    dX = (dXrow + dYcol)[:n] * scale
    return K, 0.5 * dX


def n_block_tiles(n: int) -> int:
    """Tile count of the full symmetric schedule for ``n`` particles."""
    return _tile_lists(_cdiv(n, _LB) * _LB)[0].shape[0]


def block_tile_shard(n: int, ndev: int):
    """Static per-device tile lists for the sharded symmetric Gram.

    Splits the full triangle tile schedule round-robin over ``ndev``
    devices, padding every device to the same tile count with zero-weight
    dummies. Returns numpy arrays ``(I [ndev, Td], J [ndev, Td],
    seed [ndev, Td], w [ndev, Td])``; dummy tiles have ``w = 0`` (their K
    tiles are weight-masked out and their gradients vanish through the
    zeroed mask-seed)."""
    n_pad = _cdiv(n, _LB) * _LB
    I, J, seed = _tile_lists(n_pad)
    per = [[] for _ in range(ndev)]
    for t in range(I.shape[0]):
        per[t % ndev].append((I[t], J[t], seed[t], 1.0))
    td = max(len(p) for p in per)
    for p in per:
        while len(p) < td:
            p.append((0, 0, 0.0, 0.0))
    arr = np.asarray(per, np.float32)         # [ndev, Td, 4]
    return (
        arr[..., 0].astype(np.int32),
        arr[..., 1].astype(np.int32),
        arr[..., 2].astype(np.float32),
        arr[..., 3].astype(np.float32),
    )


def block_tiles_ks_partial(X: jax.Array, h: jax.Array, s: jax.Array,
                           I: jax.Array, J: jax.Array, seed: jax.Array,
                           w: jax.Array):
    """Per-device partial ``K@s`` and pull-back gradient over a tile subset.

    ``X [n, L, C]`` is the FULL (replicated) path batch, ``s [n, d]`` the
    gathered score matrix; ``I/J/seed/w`` are this device's tile lists from
    :func:`block_tile_shard` (traced values — they differ per device under
    shard_map). The full Gram is never materialized: each tile contributes
    ``k_t @ s[J]`` to its row block and — for strictly-upper tiles, which
    stand for their transposes — ``k_tᵀ @ s[I]`` to its column block.
    Returns partial sums ``(ks [n_pad, d], dX [n_pad, L, C])``; psum both
    over the mesh, slice ``[:n]``, and halve dX for the
    :func:`block_gram_and_grad` repulsion convention."""
    n, L, C = X.shape
    n_pad = _cdiv(n, _LB) * _LB
    nI, nJ = n_pad // _SB, n_pad // _LB
    Xp = jnp.zeros((n_pad, L, C), X.dtype).at[:n].set(X)
    sp = jnp.zeros((n_pad, s.shape[1]), s.dtype).at[:n].set(s)
    scale = jnp.sqrt(2.0 / h).astype(X.dtype)
    Xs = Xp * scale
    xb = Xs.reshape(nI, _SB, L * C)[I]
    yb = jnp.transpose(Xs, (1, 2, 0)).reshape(L, C, nJ, _LB)
    yb = jnp.transpose(yb, (2, 0, 1, 3))[J]
    # n-boundary mask · cotangent seed · dummy-tile weight, built on-device
    # from the traced tile lists
    rows = I[:, None] * _SB + jnp.arange(_SB)[None, :]
    cols = J[:, None] * _LB + jnp.arange(_LB)[None, :]
    m = (rows[:, :, None] < n) & (cols[:, None, :] < n)
    ms = m.astype(X.dtype) * (seed * w)[:, None, None]
    k_t, dxr, dyc = _block_call(X, h, xb, yb, ms)
    k_t = k_t * jnp.where(m, 1.0, 0.0)  # padded pairs carry garbage K
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
    dXrow = jnp.zeros((nI, _SB, L * C), X.dtype).at[I].add(dxr)
    dYcol = jnp.zeros((nJ, L * C, _LB), X.dtype).at[J].add(dyc)
    dXp = (
        dXrow.reshape(n_pad, L, C)
        + jnp.transpose(dYcol, (0, 2, 1)).reshape(n_pad, L, C)
    ) * scale
    return ks, dXp
