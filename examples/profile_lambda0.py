"""Per-stage profile of the λ=0 fused signature-kernel Pallas path.

VERDICT r4 item 1: the calibrated (dyadic-0) Gram+adjoint costs ~105 ms per
SVGD step at the flagship shape (524,800 triangle pairs, 40-point τ paths,
C=2) — ~125 ps/cell vs the λ=3 band kernel's 10.5 ps/cell — and nobody had
measured WHERE the fixed per-pair overhead goes. This script times stage-
toggled variants of the forward/backward kernels on the real TPU chip and
emits the split (statics / PDE sweep / residual IO / pull-back) to
``results/lambda0_profile_r5.json``.

Methodology: each variant keeps the grid, BlockSpecs and HBM traffic of the
production kernel and stubs ONE stage with a shape-identical cheap
computation (one vector op), so differences isolate that stage's VPU issue
cost. Variants are diagnostics only — their numerics are wrong by
construction and nothing outside this script uses them.

Run: ``python examples/profile_lambda0.py`` (TPU; ~2 min incl. compiles).
"""
from __future__ import annotations

import json
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sigsvgd_tpu.kernels.pallas_sigkernel import (
    _S,
    _P,
    _g_row,
    _interpret,
    _params,
    _yn_init,
)
from sigsvgd_tpu.kernels import pallas_sigkernel_small as small

_I12 = 1.0 / 12.0
_I6 = 1.0 / 6.0

N_POL = 1024
L = 40
C = 2
H_BW = 4.0


# ---------------------------------------------------------------------------
# Stage-toggled forward.
# ---------------------------------------------------------------------------


def _fwd_kernel_v(lx1, ly1, statics, sweep, store_res, xg0_ref, xg1_ref,
                  yg_ref, k_ref, fac_ref, krow_ref, grow_ref, yn_ref):
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        _yn_init(yg_ref, yn_ref)
        if statics:
            g0, _ = _g_row(xg0_ref, yg_ref, yn_ref)
        else:
            g0 = xg0_ref[0, 0, 0] + yg_ref[0, :, 0]
        grow_ref[:] = g0
        krow_ref[:] = jnp.ones_like(krow_ref)

    gl = grow_ref[:]
    if statics:
        gu, _ = _g_row(xg1_ref, yg_ref, yn_ref)
    else:
        gu = xg1_ref[0, 0, 0] + yg_ref[0, :, 0]
    grow_ref[:] = gu
    z = gu[1:] - gu[:-1] - gl[1:] + gl[:-1]
    a = 1.0 + z * (0.5 + z * _I12)
    b = 1.0 - z * z * _I12

    if sweep:
        kl = jnp.ones_like(krow_ref[0])
        prev_old = krow_ref[0]
        for j in range(ly1):
            old = krow_ref[j + 1]
            kn = (kl + old) * a[j] - prev_old * b[j]
            if store_res:
                fac_ref[0, 0, j] = (kl + old) * (0.5 + z[j] * _I6) \
                    + prev_old * (z[j] * _I6)
            krow_ref[j + 1] = kn
            prev_old = old
            kl = kn
    else:
        # shape-preserving stub: one row op + (optionally) the residual store
        krow_ref[1:] = krow_ref[1:] * a - b
        if store_res:
            for j in range(ly1):
                fac_ref[0, 0, j] = a[j]
        kl = krow_ref[ly1]

    @pl.when(r == lx1 - 1)
    def _():
        k_ref[0] = kl


def fwd_call_v(xg, yg, statics=True, sweep=True, store_res=True):
    nt, lx1 = xg.shape[0], xg.shape[1] - 1
    ly = yg.shape[1]
    ly1 = ly - 1
    Cc = xg.shape[2]
    kern = partial(_fwd_kernel_v, lx1, ly1, statics, sweep, store_res)
    out = pl.pallas_call(
        kern,
        grid=(nt, lx1),
        in_specs=[
            pl.BlockSpec((1, 1, Cc, _S, 128), lambda p, r: (p, r, 0, 0, 0)),
            pl.BlockSpec((1, 1, Cc, _S, 128), lambda p, r: (p, r + 1, 0, 0, 0)),
            pl.BlockSpec((1, ly, Cc, _S, 128), lambda p, r: (p, 0, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, _S, 128), lambda p, r: (p, 0, 0)),
            pl.BlockSpec((1, 1, ly1, _S, 128), lambda p, r: (p, r, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nt, _S, 128), xg.dtype),
            jax.ShapeDtypeStruct((nt, lx1, ly1, _S, 128), xg.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((ly, _S, 128), xg.dtype),
            pltpu.VMEM((ly, _S, 128), xg.dtype),
            pltpu.VMEM((ly, _S, 128), xg.dtype),
        ],
        compiler_params=_params(),
        interpret=_interpret(),
    )(xg, xg, yg)
    return out


# ---------------------------------------------------------------------------
# Stage-toggled backward.
# ---------------------------------------------------------------------------


def _bwd_kernel_v(lx1, ly1, statics, serial, pullback, xgi_ref, xgi1_ref,
                  yg_ref, fac_ref, gout_ref, dxhi_ref, dx0_ref, dyg_ref,
                  lamc_ref, lamn_ref, dgu_ref, dgc_ref, gup_ref, yn_ref,
                  dya_ref):
    Cc = xgi_ref.shape[2]
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        _yn_init(yg_ref, yn_ref)
        if statics:
            g1, _ = _g_row(xgi1_ref, yg_ref, yn_ref)
        else:
            g1 = xgi1_ref[0, 0, 0] + yg_ref[0, :, 0]
        gup_ref[:] = g1
        lamc_ref[:] = jnp.zeros_like(lamc_ref)
        lamc_ref[ly1] = gout_ref[0]
        lamn_ref[:] = jnp.zeros_like(lamn_ref)
        dgu_ref[:] = jnp.zeros_like(dgu_ref)
        dgc_ref[:] = jnp.zeros_like(dgc_ref)
        dya_ref[:] = jnp.zeros_like(dya_ref)

    gu = gup_ref[:]
    if statics:
        gl, _ = _g_row(xgi_ref, yg_ref, yn_ref)
    else:
        gl = xgi_ref[0, 0, 0] + yg_ref[0, :, 0]
    gup_ref[:] = gl
    z = gu[1:] - gu[:-1] - gl[1:] + gl[:-1]
    a = 1.0 + z * (0.5 + z * _I12)
    b = 1.0 - z * z * _I12

    if serial:
        lam_right = lamc_ref[ly1]
        for j in range(ly1 - 1, -1, -1):
            lam = lam_right
            t = lam * a[j]
            lam_right = lamc_ref[j] + t
            lamc_ref[j] = lam_right
            lamn_ref[j + 1] = lamn_ref[j + 1] + t
            lamn_ref[j] = lamn_ref[j] - lam * b[j]
            dz = lam * fac_ref[0, 0, j]
            dgu_ref[j + 1] = dgu_ref[j + 1] + dz
            dgu_ref[j] = dgu_ref[j] - dz
            dgc_ref[j + 1] = dgc_ref[j + 1] - dz
            dgc_ref[j] = dgc_ref[j] + dz
    else:
        # row-op stub touching the same buffers once
        lamc_ref[1:] = lamc_ref[1:] * a
        lamn_ref[1:] = lamn_ref[1:] + b
        dgu_ref[:ly1] = dgu_ref[:ly1] + fac_ref[0, 0]
        dgc_ref[:ly1] = dgc_ref[:ly1] - fac_ref[0, 0]

    if pullback:
        w = dgu_ref[:] * gu
        sw = w[0]
        for t in range(1, ly1 + 1):
            sw = sw + w[t]
        for c in range(Cc):
            x_c = xgi1_ref[0, 0, c]
            swy = w[0] * yg_ref[0, 0, c]
            for t in range(1, ly1 + 1):
                swy = swy + w[t] * yg_ref[0, t, c]
            dxhi_ref[0, 0, c] = 2.0 * (swy - x_c * sw)
            for t in range(ly1 + 1):
                dya_ref[t, c] = dya_ref[t, c] - 2.0 * w[t] * (
                    yg_ref[0, t, c] - x_c
                )
    else:
        for c in range(Cc):
            dxhi_ref[0, 0, c] = dgu_ref[0] * gu[0]

    dgu_ref[:] = dgc_ref[:]
    dgc_ref[:] = jnp.zeros_like(dgc_ref)
    lamc_ref[:] = lamn_ref[:]
    lamn_ref[:] = jnp.zeros_like(lamn_ref)

    @pl.when(r == lx1 - 1)
    def _():
        if pullback:
            w0 = dgu_ref[:] * gl
            sw0 = w0[0]
            for t in range(1, ly1 + 1):
                sw0 = sw0 + w0[t]
            for c in range(Cc):
                x_c = xgi_ref[0, 0, c]
                swy0 = w0[0] * yg_ref[0, 0, c]
                for t in range(1, ly1 + 1):
                    swy0 = swy0 + w0[t] * yg_ref[0, t, c]
                dx0_ref[0, 0, c] = 2.0 * (swy0 - x_c * sw0)
                for t in range(ly1 + 1):
                    dyg_ref[0, t, c] = (
                        dya_ref[t, c] - 2.0 * w0[t] * (yg_ref[0, t, c] - x_c)
                    )
        else:
            for c in range(Cc):
                dx0_ref[0, 0, c] = dgu_ref[0]
                dyg_ref[0, :, c] = dya_ref[:, c]


def bwd_call_v(xg, yg, fac, g_out, statics=True, serial=True, pullback=True):
    nt, lx1 = xg.shape[0], xg.shape[1] - 1
    ly = yg.shape[1]
    ly1 = ly - 1
    Cc = xg.shape[2]
    kern = partial(_bwd_kernel_v, lx1, ly1, statics, serial, pullback)
    return pl.pallas_call(
        kern,
        grid=(nt, lx1),
        in_specs=[
            pl.BlockSpec(
                (1, 1, Cc, _S, 128), lambda p, r: (p, lx1 - 1 - r, 0, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, Cc, _S, 128), lambda p, r: (p, lx1 - r, 0, 0, 0)
            ),
            pl.BlockSpec((1, ly, Cc, _S, 128), lambda p, r: (p, 0, 0, 0, 0)),
            pl.BlockSpec(
                (1, 1, ly1, _S, 128), lambda p, r: (p, lx1 - 1 - r, 0, 0, 0)
            ),
            pl.BlockSpec((1, _S, 128), lambda p, r: (p, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, Cc, _S, 128), lambda p, r: (p, lx1 - 1 - r, 0, 0, 0)
            ),
            pl.BlockSpec((1, 1, Cc, _S, 128), lambda p, r: (p, 0, 0, 0, 0)),
            pl.BlockSpec((1, ly, Cc, _S, 128), lambda p, r: (p, 0, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nt, lx1, Cc, _S, 128), xg.dtype),
            jax.ShapeDtypeStruct((nt, 1, Cc, _S, 128), xg.dtype),
            jax.ShapeDtypeStruct((nt, ly, Cc, _S, 128), xg.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((ly, _S, 128), xg.dtype) for _ in range(6)
        ] + [pltpu.VMEM((ly, Cc, _S, 128), xg.dtype)],
        compiler_params=_params(),
        interpret=_interpret(),
    )(xg, xg, yg, fac, g_out)


# ---------------------------------------------------------------------------
# Harness.
# ---------------------------------------------------------------------------


def _tile(paths, idx, nt):
    g = paths[idx]
    g = g.reshape(nt, _S, 128, paths.shape[1], paths.shape[2])
    return jnp.transpose(g, (0, 3, 4, 1, 2))


def timed(fn, *args, iters=8):
    """ms/iter of ``fn`` on the device: the remote-dispatch tunnel makes
    per-call sync times meaningless (~100 ms RTT noise), so run a DEPENDENT
    chain of ``iters`` kernel invocations inside one jit (a scalar from each
    output perturbs the first input) and sync once."""
    first = jax.jit(fn)(*args)

    def chain(*a):
        def body(i, carry):
            x0, acc = carry
            out = fn(x0, *a[1:])
            lead = out[0] if isinstance(out, (list, tuple)) else out
            s = lead[tuple([0] * lead.ndim)]
            return (x0 + 1e-30 * s, acc + s)

        _, acc = lax.fori_loop(0, iters, body, (a[0], jnp.float32(0.0)))
        return acc

    cfn = jax.jit(chain)
    _ = float(cfn(*args))  # compile + first run
    t0 = time.perf_counter()
    s = cfn(*args)
    _ = float(s)
    dt = (time.perf_counter() - t0) / iters
    return dt, first


def main():
    rng = np.random.default_rng(0)
    t = np.linspace(0, 1, L)[None, :, None]
    ph = rng.normal(size=(N_POL, 1, C)).astype(np.float32)
    X = jnp.asarray(
        (0.5 * np.sin(3 * t + ph) + 0.05 * rng.normal(size=(N_POL, L, C)))
        .astype(np.float32)
    )
    h = jnp.asarray(H_BW, jnp.float32)
    iu, ju = np.triu_indices(N_POL)
    P0 = iu.shape[0]
    pad = -(-P0 // _P) * _P - P0
    ix = jnp.asarray(np.concatenate([iu, np.zeros(pad, np.int64)]))
    iy = jnp.asarray(np.concatenate([ju, np.zeros(pad, np.int64)]))
    nt = ix.shape[0] // _P
    w = jnp.asarray(rng.normal(size=(ix.shape[0],)).astype(np.float32))

    scale = jax.lax.rsqrt(h)
    Xs = X * scale
    xg = jax.block_until_ready(_tile(Xs, ix, nt))
    yg = jax.block_until_ready(_tile(Xs, iy, nt))
    print(f"pairs={P0} tiles={nt} grid={L-1}x{L-1} C={C}", file=sys.stderr)

    res = {"pairs": P0, "tiles": int(nt), "L": L, "C": C}

    # production end-to-end (value + vjp, through the tiling/gather layer)
    f_full = jax.jit(
        jax.grad(
            lambda x: jnp.sum(small.pallas_pair_gram_small(x, x, ix, iy, h) * w)
        )
    )
    dt, _ = timed(f_full, X, iters=4)
    res["e2e_value_and_grad_ms"] = dt * 1e3

    fwd_cfgs = {
        "fwd_full": dict(statics=True, sweep=True, store_res=True),
        "fwd_no_res_store": dict(statics=True, sweep=True, store_res=False),
        "fwd_no_statics": dict(statics=False, sweep=True, store_res=True),
        "fwd_no_sweep": dict(statics=True, sweep=False, store_res=True),
        "fwd_statics_only": dict(statics=True, sweep=False, store_res=False),
        "fwd_empty": dict(statics=False, sweep=False, store_res=False),
    }
    fac = None
    for name, cfg in fwd_cfgs.items():
        f = jax.jit(lambda a, b, c=cfg: fwd_call_v(a, b, **c))
        dt, out = timed(f, xg, yg)
        res[name + "_ms"] = dt * 1e3
        if name == "fwd_full":
            fac = out[1]
        print(f"{name}: {dt*1e3:.2f} ms", file=sys.stderr)

    gout = jnp.ones((nt, _S, 128), jnp.float32)
    bwd_cfgs = {
        "bwd_full": dict(statics=True, serial=True, pullback=True),
        "bwd_no_statics": dict(statics=False, serial=True, pullback=True),
        "bwd_no_serial": dict(statics=True, serial=False, pullback=True),
        "bwd_no_pullback": dict(statics=True, serial=True, pullback=False),
        "bwd_empty": dict(statics=False, serial=False, pullback=False),
    }
    for name, cfg in bwd_cfgs.items():
        f = jax.jit(lambda a, b, fc, g, c=cfg: bwd_call_v(a, b, fc, g, **c))
        dt, _ = timed(f, xg, yg, fac, gout)
        res[name + "_ms"] = dt * 1e3
        print(f"{name}: {dt*1e3:.2f} ms", file=sys.stderr)

    # derived split
    res["split"] = {
        "fwd_statics_ms": res["fwd_full_ms"] - res["fwd_no_statics_ms"],
        "fwd_sweep_ms": res["fwd_full_ms"] - res["fwd_no_sweep_ms"],
        "fwd_res_store_ms": res["fwd_full_ms"] - res["fwd_no_res_store_ms"],
        "fwd_base_ms": res["fwd_empty_ms"],
        "bwd_statics_ms": res["bwd_full_ms"] - res["bwd_no_statics_ms"],
        "bwd_serial_ms": res["bwd_full_ms"] - res["bwd_no_serial_ms"],
        "bwd_pullback_ms": res["bwd_full_ms"] - res["bwd_no_pullback_ms"],
        "bwd_base_ms": res["bwd_empty_ms"],
    }
    out_path = "/root/repo/results/lambda0_profile_r5.json"
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res["split"], indent=1))
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
