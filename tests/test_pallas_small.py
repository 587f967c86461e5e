"""λ=0 VMEM-resident fused Pallas kernel (interpret mode on CPU) and the
workload-calibrated adaptive dyadic order.

Reference semantics: the same FD scheme as the reference's ``sigkernel``
dependency (``_traj_kernels.py:198-206``) at ``dyadic_order=0``; the adaptive
order is this framework's accuracy-calibrated replacement for the reference's
fixed config value (``particle_maze_config.yaml:20``), evidence in
``docs/adaptive_dyadic_study.md``.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigsvgd_tpu.kernels.pallas_sigkernel_small import (
    pallas_pair_gram_small,
    small_supported,
)
from sigsvgd_tpu.kernels.sigkernel import (
    SignatureKernel,
    gram_increments,
    solve_goursat_pde_scan,
)


def _pad_pairs(n):
    iu, ju = np.triu_indices(n)
    pad = -(-iu.shape[0] // 2048) * 2048 - iu.shape[0]
    ix = jnp.asarray(np.concatenate([iu, np.zeros(pad, np.int64)]))
    iy = jnp.asarray(np.concatenate([ju, np.zeros(pad, np.int64)]))
    return ix, iy, iu.shape[0]


def _ref_vals(X, Y, ix, iy, h):
    xc, yc = X[ix], Y[iy]
    d2 = jnp.sum((xc[:, :, None, :] - yc[:, None, :, :]) ** 2, axis=-1)
    return solve_goursat_pde_scan(gram_increments(jnp.exp(-d2 / h)), 0)


def test_small_values_match_wavefront(rng):
    n, L, C = 12, 13, 2
    X = jnp.asarray(rng.normal(size=(n, L, C)).astype(np.float32) * 0.3)
    h = jnp.asarray(4.0, jnp.float32)
    ix, iy, P = _pad_pairs(n)
    want = np.asarray(_ref_vals(X, X, ix, iy, h))[:P]
    got = np.asarray(pallas_pair_gram_small(X, X, ix, iy, h))[:P]
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=2e-5)


def test_small_vjp_matches_wavefront_ad(rng):
    n, L, C = 10, 9, 3
    X = jnp.asarray(rng.normal(size=(n, L, C)).astype(np.float32) * 0.4)
    Y = jnp.asarray(rng.normal(size=(n, L, C)).astype(np.float32) * 0.4)
    h = jnp.asarray(2.0, jnp.float32)
    ix, iy, P = _pad_pairs(n)
    w = jnp.asarray(rng.normal(size=(ix.shape[0],)).astype(np.float32))

    g_ref = jax.grad(
        lambda x, y, hh: jnp.sum(_ref_vals(x, y, ix, iy, hh) * w),
        argnums=(0, 1, 2),
    )(X, Y, h)
    g_new = jax.grad(
        lambda x, y, hh: jnp.sum(pallas_pair_gram_small(x, y, ix, iy, hh) * w),
        argnums=(0, 1, 2),
    )(X, Y, h)
    for a, b in zip(g_ref, g_new):
        scale = float(np.abs(np.asarray(a)).max())
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=5e-5
        )


def test_signature_kernel_small_route(rng):
    """End-to-end through SignatureKernel: the explicit pallas_small solver
    (interpret mode) agrees with the wavefront route for gram_and_grad."""
    n, L, C = 20, 11, 2
    X = jnp.asarray(rng.normal(size=(n, L, C)).astype(np.float32) * 0.3)
    k_small = SignatureKernel(dyadic_order=0, bandwidth=3.0, solver="pallas_small")
    k_wave = SignatureKernel(dyadic_order=0, bandwidth=3.0, solver="wavefront")
    assert k_small._solver_kind(L - 1, L - 1) == "pallas_small"
    K_s, dX_s = k_small.gram_and_grad(X)
    K_w, dX_w = k_wave.gram_and_grad(X)
    np.testing.assert_allclose(np.asarray(K_s), np.asarray(K_w), atol=3e-5)
    scale = float(np.abs(np.asarray(dX_w)).max())
    np.testing.assert_allclose(
        np.asarray(dX_s) / scale, np.asarray(dX_w) / scale, atol=5e-5
    )


def test_small_supported_envelope():
    assert small_supported(39, 39, 0, 2, "rbf", 4.0)
    assert not small_supported(39, 39, 3, 2, "rbf", 4.0)  # refined grid
    assert not small_supported(39, 70, 0, 2, "rbf", 4.0)  # row buffers
    assert not small_supported(39, 39, 0, 9, "rbf", 4.0)  # channels
    assert not small_supported(39, 39, 0, 2, "linear", None)  # statics
    # joint ly·C VMEM bound (ADVICE r4): the envelope edge ly1=63 is only
    # admissible while (10+3C)·ly row tiles fit the 12 MB budget
    assert small_supported(39, 63, 0, 2, "rbf", 4.0)
    assert not small_supported(39, 63, 0, 8, "rbf", 4.0)


def test_calibrate_dyadic_order(rng):
    """Small-z workloads (short smooth paths, wide bandwidth) calibrate to
    λ=0; O(1)-z workloads keep the configured order."""
    t = np.linspace(0.0, 1.0, 21)[None, :, None]
    ph = rng.normal(size=(16, 1, 2)).astype(np.float32)
    smooth = jnp.asarray(0.2 * np.sin(3.0 * t + ph) * np.ones((16, 21, 2), np.float32))
    k3 = SignatureKernel(dyadic_order=3, bandwidth=4.0, solver="wavefront")
    assert k3.calibrate_dyadic_order(smooth).dyadic_order == 0

    rough = jnp.asarray(rng.normal(size=(16, 21, 2)).astype(np.float32) * 2.0)
    k_rough = SignatureKernel(dyadic_order=3, bandwidth=0.5, solver="wavefront")
    cal = k_rough.calibrate_dyadic_order(rough)
    assert cal.dyadic_order == 3

    # already-unrefined kernels are returned unchanged
    k0 = dataclasses.replace(k3, dyadic_order=0)
    assert k0.calibrate_dyadic_order(smooth) is k0


def test_calibrated_order_matches_configured_accuracy(rng):
    """The calibration promise: when λ=0 is chosen, its values agree with the
    configured λ=3 solve to within the tolerance used to choose it."""
    t = np.linspace(0.0, 1.0, 21)[None, :, None]
    ph = rng.normal(size=(12, 1, 2)).astype(np.float32)
    X = jnp.asarray(0.2 * np.sin(3.0 * t + ph) * np.ones((12, 21, 2), np.float32))
    k3 = SignatureKernel(dyadic_order=3, bandwidth=4.0, solver="wavefront")
    cal = k3.calibrate_dyadic_order(X, tol=1e-4)
    assert cal.dyadic_order == 0
    K3 = np.asarray(k3.gram(X, X))
    K0 = np.asarray(cal.gram(X, X))
    # the fp32 λ3 solve contributes its own rounding (28k cells/pair at this
    # shape), so the λ0-vs-λ3 difference is discretization + both solvers'
    # fp32 noise — bounded a few multiples above the calibration tolerance
    assert np.max(np.abs(K3 - K0)) < 5e-4
