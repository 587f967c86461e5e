"""Microbenchmark: Goursat-PDE solver paths on the real TPU chip.

Times forward and forward+backward per pair for the Pallas band-streamed
kernel vs the XLA wavefront scan at the flagship MPC shape (H=40 paths,
dyadic order 3 — ``particle_maze_config.yaml:20``), and the MXU
block-propagator at the planning shape (5 knots, dyadic 6 —
``script_planning_robot.py:520``).

Usage:  python examples/bench_pde_kernel.py [--pairs 16384] [--reps 20]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def _bench(fn, inc, reps=20):
    """In-program chained timing: ``reps`` applications run inside ONE jitted
    scan, each rep's input depending on the previous rep's output. Three
    remote-tunnel traps this layout avoids: (a) host-side rep loops measure
    per-dispatch latency, not compute — one dispatch amortizes it 1/reps;
    (b) repeating the warmup's exact arguments hits a remote memoization
    cache, so the timed call uses a DIFFERENT input; (c) only a host value
    fetch reliably bounds completion."""
    from jax import lax

    def body(x, _):
        out = fn(x)
        dep = out if out.ndim == inc.ndim else out[:, None, None]
        return x + 1e-30 * dep, ()

    run = jax.jit(lambda z: lax.scan(body, z, None, length=reps)[0])
    float(run(inc + 1.0).sum())  # compile + complete on a distinct input
    t0 = time.perf_counter()
    float(run(inc).sum())
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=16384)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--mpc-len", type=int, default=40)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/sigsvgd_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from sigsvgd_tpu.kernels.pallas_sigkernel import solve_goursat_pde_pallas
    from sigsvgd_tpu.kernels.sigkernel import (
        solve_goursat_pde,
        solve_goursat_pde_mxu,
    )

    key = jax.random.PRNGKey(0)
    B, L = args.pairs, args.mpc_len
    inc = jax.random.normal(key, (B, L - 1, L - 1), jnp.float32) * 0.05

    def loss(solver):
        def f(z):
            return jnp.sum(solver(z))

        return f

    def report(name, which, b, t):
        print(f"{name:26s} {which:8s} {b:7d} {t/b*1e6:9.3f} µs/pair", flush=True)

    from sigsvgd_tpu.kernels.sigkernel import auto_chunk

    chunk = auto_chunk(L - 1, L - 1, 3)
    # note: no nested jax.jit around fn — _bench jits the whole scan, and a
    # nested jit inside the scanned body has crashed the device runtime
    for name, fwd, slow in (
        ("pallas dyadic-3", lambda z: solve_goursat_pde_pallas(z, 3), False),
        ("xla-scan dyadic-3", lambda z: solve_goursat_pde(z, 3, chunk), True),
    ):
        # the wavefront adjoint runs ~90 µs/pair: at 131k pairs a full-reps
        # chained scan is a single >1-minute device dispatch, which the
        # remote-execution tunnel kills (surfaces as a TPU worker crash).
        # Cap the slow cases' single-dispatch length; per-pair numbers are
        # batch-linear there so the smaller batch is representative.
        bs, reps = (min(B, 16384), 2) if slow else (B, args.reps)
        report(name, "fwd", bs, _bench(fwd, inc[:bs], reps=args.reps))
        report(name, "fwd+bwd", bs, _bench(jax.grad(loss(fwd)), inc[:bs], reps=reps))

    # planning shape: 5-knot paths, dyadic 6 -> MXU block-propagator
    inc6 = jax.random.normal(key, (B, 4, 4), jnp.float32) * 0.3
    for prec in ("highest", "high", "default"):
        fwd6 = lambda z, p=prec: solve_goursat_pde_mxu(z, 6, precision=p)
        report(f"mxu dyadic-6 ({prec})", "fwd", B, _bench(fwd6, inc6, reps=args.reps))
        report(f"mxu dyadic-6 ({prec})", "fwd+bwd", B,
               _bench(jax.grad(loss(fwd6)), inc6, reps=args.reps))


if __name__ == "__main__":
    main()
