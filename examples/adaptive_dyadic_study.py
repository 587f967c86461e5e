"""Regenerates the tables in ``docs/adaptive_dyadic_study.md``.

Part 1 (CPU, fp64): discretization error of each dyadic order against a
dyadic-6 fp64 oracle on REAL flagship τ paths — both kernel values and the
SVGD pull-back gradient. Part 2 (fp32): consecutive-order differences,
showing rounding growing with refinement where fp64 shows it shrinking.

Run with ``JAX_PLATFORMS=cpu`` unset on TPU for part 2's in-situ numbers;
fp64 requires the CPU backend (x64 is set via jax.config at runtime because
the container pre-imports jax).
"""
import sys
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, ".")

from sigsvgd_tpu.kernels.sigkernel import SignatureKernel  # noqa: E402

import bench  # noqa: E402


def main():
    st = bench._setup()
    ctrl, q_start = st["ctrl_sig"], st["q_start"]
    cstate = ctrl.init(jax.random.PRNGKey(1))
    _c, trajs = ctrl._rollout_costs(q_start, cstate.pol_mean, None)
    tau = np.asarray(ctrl._tau(trajs))
    idx = np.random.default_rng(0).choice(tau.shape[0], size=16, replace=False)
    X = jnp.asarray(tau[idx], dtype=jnp.float64)
    print("tau subset:", X.shape, "path spread:", float(jnp.std(X)))

    def solve(dy):
        k = SignatureKernel(
            dyadic_order=dy, bandwidth=bench.SIG_BW, solver="wavefront"
        )
        return k.gram_and_grad(X)

    results = {}
    for dy in [6, 3, 2, 1, 0]:
        t0 = time.time()
        K, dX = solve(dy)
        results[dy] = (np.asarray(K), np.asarray(dX))
        print(f"dyadic {dy}: {time.time()-t0:.1f}s")

    K6, dX6 = results[6]

    def err(K, dX, name):
        ek = np.linalg.norm(K - K6) / np.linalg.norm(K6)
        em = np.max(np.abs(K - K6))
        eg = np.linalg.norm(dX - dX6) / np.linalg.norm(dX6)
        cos = np.sum(dX * dX6) / (
            np.linalg.norm(dX) * np.linalg.norm(dX6)
        )
        print(
            f"{name:>18}: K relerr {ek:.3e}  K maxabs {em:.3e}  "
            f"grad relerr {eg:.3e}  grad cos {cos:.6f}"
        )

    for dy in [3, 2, 1, 0]:
        err(*results[dy], f"plain dyadic {dy}")
    K_r = (4.0 * results[2][0] - results[1][0]) / 3.0
    dX_r = (4.0 * results[2][1] - results[1][1]) / 3.0
    err(K_r, dX_r, "richardson(2,1)")

    # consecutive-order differences (fp64 here; run on TPU for the fp32 row)
    for lo, hi in [(0, 1), (1, 2), (2, 3)]:
        d = np.max(np.abs(results[lo][0] - results[hi][0]))
        print(f"max|K{lo}-K{hi}| = {d:.3e}")

    # the calibration decision on these paths
    k3 = SignatureKernel(dyadic_order=3, bandwidth=bench.SIG_BW)
    cal = k3.calibrate_dyadic_order(jnp.asarray(tau, jnp.float32))
    print("calibrate_dyadic_order →", cal.dyadic_order)


if __name__ == "__main__":
    main()
