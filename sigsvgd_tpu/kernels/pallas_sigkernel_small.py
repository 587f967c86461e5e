"""Pallas Goursat-PDE kernel for UNREFINED grids (dyadic order 0).

Why this exists: on the flagship MPC workload the PDE coefficient is tiny
(`z = Δg ~ 1e-4` — short, smooth τ paths against a fixed bandwidth), so the
second-order scheme's discretization error is orders of magnitude below the
fp32 rounding floor at ANY dyadic order (measured on real flagship paths
against an fp64 dyadic-6 oracle: grad rel-err 2.7e-6 at λ=3, 1.6e-4 at λ=0 —
see ``docs/adaptive_dyadic_study.md``). Solving the reference-default λ=3
grid there burns 64× the cells for accuracy fp32 cannot represent.
``SignatureKernel.calibrate_dyadic_order`` measures that error bound on a
path subsample and drops to λ=0 only when it is below tolerance; this module
is the fast solver for that grid.

Reference semantics: the same FD scheme as ``sigkernel``'s CPU/CUDA solvers
(`/root/reference` uses it via ``_traj_kernels.py:198-206``) with
``dyadic_order=0`` — this kernel changes the SCHEDULE, not the math.

Design (vs the band-streamed λ=3 kernel in ``pallas_sigkernel.py``): a λ=0
grid is only ``lx1 × ly1`` cells (~1.5k at the flagship shape, vs 97k fine
cells at λ=3), so nothing needs checkpointing or reconstruction:

- forward: grid ``(ntiles, lx1)``, one K-row per program carried in VMEM
  scratch; the RBF static Gram rows are computed in-kernel from the resident
  scaled paths (fused statics — per-pair HBM traffic is O(L·C) path tiles).
- the grad-path forward additionally emits the per-cell ``dzfac`` =
  ∂cell/∂z contraction factor ``(K_{i+1,j}+K_{i,j+1})·A'(z) − K_{i,j}·B'(z)``
  (A' = ½ + z/6, B' = −z/6) — the ONLY residual, lx1·ly1 floats/pair.
- backward: grid ``(ntiles, lx1)`` descending. Two carried adjoint rows
  (λ_{i+1} complete, λ_i accumulating) sweep right-to-left; ``dz = λ·dzfac``
  needs no primal reconstruction at all. The static-Gram pull-back
  (dz → dg → dX, dY) runs in the same program from the freshly recomputed
  g-rows (g rows have no recurrence), accumulating dY in VMEM scratch.

Tile convention matches ``pallas_sigkernel.py``: [16, 128] pair tiles,
2048 pairs per program, paths pre-scaled by ``rsqrt(h)`` outside (so the
bandwidth gradient flows through plain jax ops).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sigkernel import (
    _S,
    _P,
    _g_row,
    _interpret,
    _params,
    _yn_init,
)

_I12 = 1.0 / 12.0
_I6 = 1.0 / 6.0


def small_supported(lx1: int, ly1: int, dyadic_order: int, n_channels: int,
                    static: str, h) -> bool:
    """Shapes the λ=0 fused kernel accepts. lx1 is unbounded (rows stream;
    the dzfac residual is the only O(lx1) state and lives in HBM). The
    backward's VMEM footprint is a JOINT function of ly1 and C (ADVICE r4):
    six [ly, 16, 128] row buffers, the [ly, C, 16, 128] dY accumulator,
    and the double-buffered xg/yg/dyg blocks (~3C more ly-rows) — so the
    envelope bounds ``(10 + 3·C)·ly`` row-tiles against a 12 MB budget
    instead of ly1 alone (ly1=63 × C=8 would demand ~16 MB and fail Mosaic
    allocation)."""
    ly = ly1 + 1
    vmem = (10 + 3 * n_channels) * ly * 16 * 128 * 4
    return (
        dyadic_order == 0
        and ly1 <= 63
        and n_channels <= 8
        and vmem <= 12 * 2**20
        and static == "rbf"
        and h is not None
    )


# ---------------------------------------------------------------------------
# Forward kernel.
# ---------------------------------------------------------------------------


def _small_fwd_kernel(lx1, ly1, with_res, xg0_ref, xg1_ref, yg_ref, k_ref,
                      *rest):
    """Row I of the λ=0 sweep: consumes path rows I (static-Gram row carried
    in ``grow_ref``) and I+1 (computed here), advances the K node row held in
    ``krow_ref``. When ``with_res``, also stores the cell's dz contraction
    factor into the residual block ``fac_ref`` (the only backward state)."""
    if with_res:
        fac_ref, krow_ref, grow_ref, yn_ref = rest
    else:
        krow_ref, grow_ref, yn_ref = rest
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        _yn_init(yg_ref, yn_ref)
        g0, _ = _g_row(xg0_ref, yg_ref, yn_ref)
        grow_ref[:] = g0
        krow_ref[:] = jnp.ones_like(krow_ref)

    gl = grow_ref[:]
    gu, _ = _g_row(xg1_ref, yg_ref, yn_ref)
    grow_ref[:] = gu
    z = gu[1:] - gu[:-1] - gl[1:] + gl[:-1]  # [ly1, S, 128]
    a = 1.0 + z * (0.5 + z * _I12)
    b = 1.0 - z * z * _I12

    kl = jnp.ones_like(krow_ref[0])  # K_{i+1, 0} = 1 (left boundary)
    prev_old = krow_ref[0]           # K_{i, 0}
    for j in range(ly1):
        old = krow_ref[j + 1]        # K_{i, j+1}
        kn = (kl + old) * a[j] - prev_old * b[j]
        if with_res:
            fac_ref[0, 0, j] = (kl + old) * (0.5 + z[j] * _I6) \
                + prev_old * (z[j] * _I6)
        krow_ref[j + 1] = kn
        prev_old = old
        kl = kn

    @pl.when(r == lx1 - 1)
    def _():
        k_ref[0] = kl


def _small_fwd_call(xg, yg, with_res):
    nt, lx1 = xg.shape[0], xg.shape[1] - 1
    ly = yg.shape[1]
    ly1 = ly - 1
    C = xg.shape[2]
    kern = partial(_small_fwd_kernel, lx1, ly1, with_res)
    out_specs = [pl.BlockSpec((1, _S, 128), lambda p, r: (p, 0, 0))]
    out_shape = [jax.ShapeDtypeStruct((nt, _S, 128), xg.dtype)]
    if with_res:
        out_specs.append(
            pl.BlockSpec((1, 1, ly1, _S, 128), lambda p, r: (p, r, 0, 0, 0))
        )
        out_shape.append(
            jax.ShapeDtypeStruct((nt, lx1, ly1, _S, 128), xg.dtype)
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
            pltpu.VMEM((ly, _S, 128), xg.dtype),  # K node row
            pltpu.VMEM((ly, _S, 128), xg.dtype),  # carried g row
            pltpu.VMEM((ly, _S, 128), xg.dtype),  # yn
        ],
        compiler_params=_params(),
        interpret=_interpret(),
    )(xg, xg, yg)
    if with_res:
        return out
    return out[0]


# ---------------------------------------------------------------------------
# Backward kernel: top-down adjoint + fused static-Gram pull-back.
# ---------------------------------------------------------------------------


def _small_bwd_kernel(lx1, ly1, xgi_ref, xgi1_ref, yg_ref, fac_ref, gout_ref,
                      dxhi_ref, dx0_ref, dyg_ref,
                      lamc_ref, lamn_ref, dgu_ref, dgc_ref, gup_ref, yn_ref,
                      dya_ref):
    """Program r handles cell row ``i = lx1-1-r`` (descending).

    On entry ``lamc_ref`` holds the COMPLETE adjoint of K node row i+1 and
    ``gup_ref`` holds g row i+1. The right-to-left sweep completes λ_{i+1,j}
    in place (the serial chain), accumulates row i's adjoint into
    ``lamn_ref`` and the dz → dg scatter into the two rolling dg rows; after
    the sweep dg row i+1 is final, so its pull-back (w = dg∘g → dX row i+1,
    dY accumulation) runs here and the buffers roll down one row. The last
    program also flushes dg row 0 → dX row 0 and the dY accumulator."""
    C = xgi_ref.shape[2]
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        _yn_init(yg_ref, yn_ref)
        g1, _ = _g_row(xgi1_ref, yg_ref, yn_ref)
        gup_ref[:] = g1
        lamc_ref[:] = jnp.zeros_like(lamc_ref)
        lamc_ref[ly1] = gout_ref[0]
        lamn_ref[:] = jnp.zeros_like(lamn_ref)
        dgu_ref[:] = jnp.zeros_like(dgu_ref)
        dgc_ref[:] = jnp.zeros_like(dgc_ref)
        dya_ref[:] = jnp.zeros_like(dya_ref)

    gu = gup_ref[:]                          # g row i+1
    gl, _ = _g_row(xgi_ref, yg_ref, yn_ref)  # g row i
    gup_ref[:] = gl
    z = gu[1:] - gu[:-1] - gl[1:] + gl[:-1]
    a = 1.0 + z * (0.5 + z * _I12)
    b = 1.0 - z * z * _I12

    lam_right = lamc_ref[ly1]                # λ_{i+1, ly1}
    for j in range(ly1 - 1, -1, -1):
        lam = lam_right                      # λ_{i+1, j+1} (complete)
        t = lam * a[j]
        lam_right = lamc_ref[j] + t          # completes λ_{i+1, j}
        lamc_ref[j] = lam_right
        lamn_ref[j + 1] = lamn_ref[j + 1] + t
        lamn_ref[j] = lamn_ref[j] - lam * b[j]
        dz = lam * fac_ref[0, 0, j]
        dgu_ref[j + 1] = dgu_ref[j + 1] + dz
        dgu_ref[j] = dgu_ref[j] - dz
        dgc_ref[j + 1] = dgc_ref[j + 1] - dz
        dgc_ref[j] = dgc_ref[j] + dz

    # dg row i+1 is final: pull back through g = exp(-‖x−y‖²) (paths are
    # rsqrt(h)-prescaled).  w_t = dg_t · g_t;
    # dX_{i+1,c} = −2·x_c·Σ_t w_t + 2·Σ_t w_t·y_{t,c}
    # dY_{t,c}  += −2·w_t·(y_{t,c} − x_c)
    w = dgu_ref[:] * gu                       # [ly, S, 128]
    sw = w[0]
    for t in range(1, ly1 + 1):
        sw = sw + w[t]
    for c in range(C):
        x_c = xgi1_ref[0, 0, c]
        swy = w[0] * yg_ref[0, 0, c]
        for t in range(1, ly1 + 1):
            swy = swy + w[t] * yg_ref[0, t, c]
        dxhi_ref[0, 0, c] = 2.0 * (swy - x_c * sw)
        for t in range(ly1 + 1):
            dya_ref[t, c] = dya_ref[t, c] - 2.0 * w[t] * (yg_ref[0, t, c] - x_c)

    # roll the buffers one row down
    dgu_ref[:] = dgc_ref[:]
    dgc_ref[:] = jnp.zeros_like(dgc_ref)
    lamc_ref[:] = lamn_ref[:]
    lamn_ref[:] = jnp.zeros_like(lamn_ref)

    @pl.when(r == lx1 - 1)
    def _():
        # dg row 0 (now in dgu after the roll) → dX row 0; flush dY
        w0 = dgu_ref[:] * gl
        sw0 = w0[0]
        for t in range(1, ly1 + 1):
            sw0 = sw0 + w0[t]
        for c in range(C):
            x_c = xgi_ref[0, 0, c]
            swy0 = w0[0] * yg_ref[0, 0, c]
            for t in range(1, ly1 + 1):
                swy0 = swy0 + w0[t] * yg_ref[0, t, c]
            dx0_ref[0, 0, c] = 2.0 * (swy0 - x_c * sw0)
            for t in range(ly1 + 1):
                dyg_ref[0, t, c] = (
                    dya_ref[t, c] - 2.0 * w0[t] * (yg_ref[0, t, c] - x_c)
                )


def _small_bwd_call(xg, yg, fac, g_out):
    nt, lx1 = xg.shape[0], xg.shape[1] - 1
    ly = yg.shape[1]
    ly1 = ly - 1
    C = xg.shape[2]
    kern = partial(_small_bwd_kernel, lx1, ly1)
    dxhi, dx0, dyg = pl.pallas_call(
        kern,
        grid=(nt, lx1),
        in_specs=[
            pl.BlockSpec(
                (1, 1, C, _S, 128), lambda p, r: (p, lx1 - 1 - r, 0, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, C, _S, 128), lambda p, r: (p, lx1 - r, 0, 0, 0)
            ),
            pl.BlockSpec((1, ly, C, _S, 128), lambda p, r: (p, 0, 0, 0, 0)),
            pl.BlockSpec(
                (1, 1, ly1, _S, 128), lambda p, r: (p, lx1 - 1 - r, 0, 0, 0)
            ),
            pl.BlockSpec((1, _S, 128), lambda p, r: (p, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, C, _S, 128), lambda p, r: (p, lx1 - 1 - r, 0, 0, 0)
            ),
            pl.BlockSpec((1, 1, C, _S, 128), lambda p, r: (p, 0, 0, 0, 0)),
            pl.BlockSpec((1, ly, C, _S, 128), lambda p, r: (p, 0, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nt, lx1, C, _S, 128), xg.dtype),
            jax.ShapeDtypeStruct((nt, 1, C, _S, 128), xg.dtype),
            jax.ShapeDtypeStruct((nt, ly, C, _S, 128), xg.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((ly, _S, 128), xg.dtype),      # λ row i+1 (complete)
            pltpu.VMEM((ly, _S, 128), xg.dtype),      # λ row i (accumulating)
            pltpu.VMEM((ly, _S, 128), xg.dtype),      # dg row i+1
            pltpu.VMEM((ly, _S, 128), xg.dtype),      # dg row i
            pltpu.VMEM((ly, _S, 128), xg.dtype),      # carried g row
            pltpu.VMEM((ly, _S, 128), xg.dtype),      # yn
            pltpu.VMEM((ly, C, _S, 128), xg.dtype),   # dY accumulator
        ],
        compiler_params=_params(),
        interpret=_interpret(),
    )(xg, xg, yg, fac, g_out)
    dxg = jnp.concatenate([dx0, dxhi], axis=1)  # [nt, lx, C, S, 128]
    return dxg, dyg


# ---------------------------------------------------------------------------
# Differentiable tiled entry.
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _small_tiled(xg: jax.Array, yg: jax.Array) -> jax.Array:
    return _small_fwd_call(xg, yg, with_res=False)


def _small_tiled_fwd(xg, yg):
    k, fac = _small_fwd_call(xg, yg, with_res=True)
    return k, (xg, yg, fac)


def _small_tiled_bwd(res, g_out):
    xg, yg, fac = res
    return _small_bwd_call(xg, yg, fac, g_out)


_small_tiled.defvjp(_small_tiled_fwd, _small_tiled_bwd)


def pallas_pair_gram_small(X, Y, ix, iy, h) -> jax.Array:
    """λ=0 fused-statics signature-kernel values for a pair list.

    Same contract as ``pallas_pair_gram_fused`` (``P % 2048 == 0``; padded
    pairs use index 0 and zero cotangents). Differentiable w.r.t. X, Y and
    h (h via the pre-scale)."""
    nt = ix.shape[0] // _P
    scale = lax.rsqrt(h).astype(X.dtype)
    Xs = X * scale
    Ys = Y * scale

    def tile(paths, idx):
        g = paths[idx]  # [P, L, C]
        g = g.reshape(nt, _S, 128, paths.shape[1], paths.shape[2])
        return jnp.transpose(g, (0, 3, 4, 1, 2))

    return _small_tiled(tile(Xs, ix), tile(Ys, iy)).reshape(-1)
