"""Pallas Goursat-PDE solver vs the XLA scan solver (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigsvgd_tpu.kernels.pallas_sigkernel import solve_goursat_pde_pallas
from sigsvgd_tpu.kernels.sigkernel import solve_goursat_pde_scan


def test_pallas_forward_matches_scan(rng):
    for (b, lx, ly, lam) in ((5, 3, 3, 3), (4, 3, 5, 3), (3, 5, 5, 3)):
        inc = jnp.asarray(rng.standard_normal((b, lx, ly)).astype(np.float32) * 0.3)
        want = np.asarray(solve_goursat_pde_scan(inc, lam))
        got = np.asarray(solve_goursat_pde_pallas(inc, lam))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


@pytest.mark.slow
def test_pallas_vjp_matches_scan_ad(rng):
    for (b, lx, ly, lam) in ((4, 3, 3, 3), (3, 4, 4, 3), (2, 2, 5, 3)):
        inc = jnp.asarray(rng.standard_normal((b, lx, ly)).astype(np.float32) * 0.3)
        g = jnp.asarray(rng.standard_normal(b).astype(np.float32))
        k_ref, vjp_ref = jax.vjp(lambda z: solve_goursat_pde_scan(z, lam), inc)
        k_pal, vjp_pal = jax.vjp(lambda z: solve_goursat_pde_pallas(z, lam), inc)
        np.testing.assert_allclose(np.asarray(k_pal), np.asarray(k_ref), rtol=2e-5)
        (d_ref,) = vjp_ref(g)
        (d_pal,) = vjp_pal(g)
        scale = np.abs(np.asarray(d_ref)).max()
        np.testing.assert_allclose(
            np.asarray(d_pal) / scale, np.asarray(d_ref) / scale, atol=5e-4
        )


def test_pallas_multi_tile_pairs(rng):
    """Pair counts spanning >1 [16,128] forward tile: exercises the
    backward's half-tile BlockSpec index maps (p//NH, p%NH) across tiles and
    the pad/unpad round-trip at a non-tile-aligned batch."""
    b, lx, ly, lam = 2048 + 513, 3, 3, 3
    inc = jnp.asarray(rng.standard_normal((b, lx, ly)).astype(np.float32) * 0.3)
    g = jnp.asarray(rng.standard_normal(b).astype(np.float32))
    k_ref, vjp_ref = jax.vjp(lambda z: solve_goursat_pde_scan(z, lam), inc)
    k_pal, vjp_pal = jax.vjp(lambda z: solve_goursat_pde_pallas(z, lam), inc)
    np.testing.assert_allclose(np.asarray(k_pal), np.asarray(k_ref), rtol=2e-5)
    (d_ref,) = vjp_ref(g)
    (d_pal,) = vjp_pal(g)
    scale = np.abs(np.asarray(d_ref)).max()
    np.testing.assert_allclose(
        np.asarray(d_pal) / scale, np.asarray(d_ref) / scale, atol=5e-4
    )


@pytest.mark.slow
def test_pallas_mpc_shape_smoke(rng):
    """Flagship MPC shape (H=40 path, dyadic 3) at a small pair count."""
    inc = jnp.asarray(rng.standard_normal((3, 40, 40)).astype(np.float32) * 0.05)
    g = jnp.asarray(rng.standard_normal(3).astype(np.float32))
    k_ref, vjp_ref = jax.vjp(lambda z: solve_goursat_pde_scan(z, 3), inc)
    k_pal, vjp_pal = jax.vjp(lambda z: solve_goursat_pde_pallas(z, 3), inc)
    np.testing.assert_allclose(np.asarray(k_pal), np.asarray(k_ref), rtol=1e-4)
    (d_ref,) = vjp_ref(g)
    (d_pal,) = vjp_pal(g)
    scale = np.abs(np.asarray(d_ref)).max()
    np.testing.assert_allclose(
        np.asarray(d_pal) / scale, np.asarray(d_ref) / scale, atol=1e-3
    )


@pytest.mark.slow
def test_pallas_pair_values_matches_generic_statics(rng):
    """The tile-layout statics path (pallas_pair_values: gather → [nt, L, C,
    S, 128] → fused cross/exp/increments → tiled solve) must agree with the
    generic pair-major statics + wavefront solver, values AND pull-back
    gradient, for both RBF and linear static kernels."""
    from sigsvgd_tpu.kernels.sigkernel import SignatureKernel

    n, L, C = 7, 5, 2
    X = jnp.asarray(rng.standard_normal((n, L, C)).astype(np.float32))
    for static in ("rbf", "linear"):
        k_pal = SignatureKernel(dyadic_order=3, bandwidth=2.0, static=static,
                                solver="pallas")
        k_ref = SignatureKernel(dyadic_order=3, bandwidth=2.0, static=static,
                                solver="wavefront")

        g_p, d_p = k_pal.gram_and_grad(X)
        g_r, d_r = k_ref.gram_and_grad(X)
        np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r), rtol=2e-4)
        scale = np.abs(np.asarray(d_r)).max()
        np.testing.assert_allclose(
            np.asarray(d_p) / scale, np.asarray(d_r) / scale, atol=2e-3
        )


@pytest.mark.slow
def test_fused_statics_matches_unfused(rng):
    """The fused-statics route (RBF Gram + increments computed inside the
    Pallas kernels, custom VJP to path-tile gradients) must agree with the
    XLA-statics + tiled-solve route, values AND gradients w.r.t. X, Y, h.
    Slow lane: two interpret-mode 2048-pair VJPs (~16 s); the fast lane
    still exercises the fused route end-to-end via
    test_bf16_oversize_shape_falls_back_to_fp32_fused."""
    from sigsvgd_tpu.kernels.pallas_sigkernel import (
        _P, pallas_pair_gram_fused, pallas_pair_values,
    )

    n, m, L, C = 6, 5, 5, 2
    X = jnp.asarray(rng.standard_normal((n, L, C)).astype(np.float32))
    Y = jnp.asarray(rng.standard_normal((m, L, C)).astype(np.float32))
    ix = jnp.asarray(rng.integers(0, n, _P).astype(np.int32))
    iy = jnp.asarray(rng.integers(0, m, _P).astype(np.int32))
    h = jnp.float32(1.7)
    g = jnp.asarray(rng.standard_normal(_P).astype(np.float32))

    v_ref, vjp_ref = jax.vjp(
        lambda x, y, hh: pallas_pair_values(x, y, ix, iy, hh), X, Y, h)
    v_fus, vjp_fus = jax.vjp(
        lambda x, y, hh: pallas_pair_gram_fused(x, y, ix, iy, hh), X, Y, h)
    np.testing.assert_allclose(np.asarray(v_fus), np.asarray(v_ref), rtol=2e-5,
                               atol=1e-6)
    for d_f, d_r in zip(vjp_fus(g), vjp_ref(g)):
        scale = max(np.abs(np.asarray(d_r)).max(), 1e-6)
        np.testing.assert_allclose(
            np.asarray(d_f) / scale, np.asarray(d_r) / scale, atol=1e-3
        )


@pytest.mark.slow
def test_fused_statics_mpc_shape(rng):
    """Fused statics at the flagship MPC path length (L=40, lx1=39: bands
    not divisible by bpc-candidates > 3, exercising the checkpoint slots)."""
    from sigsvgd_tpu.kernels.pallas_sigkernel import (
        _P, pallas_pair_gram_fused, pallas_pair_values,
    )

    n, L, C = 5, 40, 2
    X = 0.3 * jnp.asarray(rng.standard_normal((n, L, C)).astype(np.float32))
    ix = jnp.asarray(rng.integers(0, n, _P).astype(np.int32))
    iy = jnp.asarray(rng.integers(0, n, _P).astype(np.int32))
    h = jnp.float32(2.3)
    g = jnp.asarray(rng.standard_normal(_P).astype(np.float32))
    v_ref, vjp_ref = jax.vjp(
        lambda x: pallas_pair_values(x, x, ix, iy, h), X)
    v_fus, vjp_fus = jax.vjp(
        lambda x: pallas_pair_gram_fused(x, x, ix, iy, h), X)
    np.testing.assert_allclose(np.asarray(v_fus), np.asarray(v_ref), rtol=1e-4,
                               atol=1e-6)
    (d_f,), (d_r,) = vjp_fus(g), vjp_ref(g)
    scale = np.abs(np.asarray(d_r)).max()
    np.testing.assert_allclose(
        np.asarray(d_f) / scale, np.asarray(d_r) / scale, atol=2e-3
    )


@pytest.mark.slow
def test_bf16_delta_adjoint_matches_fp32(rng):
    """Opt-in packed-bf16 delta-form adjoint (grad_precision='bf16'):
    identical VALUES (the fp32 forward is shared) and SVGD-grade gradients
    — ~10% worst-case relative error at this tiny shape, 3.5% measured at
    the flagship MPC shape on device (docs/bf16_adjoint_study.md)."""
    from sigsvgd_tpu.kernels.pallas_sigkernel import _P, pallas_pair_gram_fused

    n, L, C = 6, 5, 2
    X = 0.4 * jnp.asarray(
        np.cumsum(rng.standard_normal((n, L, C)), 1).astype(np.float32))
    ix = jnp.asarray(rng.integers(0, n, _P).astype(np.int32))
    iy = jnp.asarray(rng.integers(0, n, _P).astype(np.int32))
    h = jnp.float32(2.0)
    g = jnp.asarray(rng.standard_normal(_P).astype(np.float32))

    v32, vjp32 = jax.vjp(lambda x: pallas_pair_gram_fused(x, x, ix, iy, h), X)
    v16, vjp16 = jax.vjp(
        lambda x: pallas_pair_gram_fused(x, x, ix, iy, h,
                                         grad_precision="bf16"), X)
    np.testing.assert_array_equal(np.asarray(v16), np.asarray(v32))
    (d32,), (d16,) = vjp32(g), vjp16(g)
    d32, d16 = np.asarray(d32), np.asarray(d16)
    rel = np.linalg.norm(d16 - d32) / np.linalg.norm(d32)
    cos = (d16 * d32).sum() / (np.linalg.norm(d16) * np.linalg.norm(d32))
    assert rel < 0.25, rel
    assert cos > 0.98, cos


def test_pallas_supported_bounds_vmem():
    """Eligibility must reject path lengths whose row buffers exceed VMEM
    (review r2: the [16,128] forward doubled the footprint; long dyadic-3
    paths must fall back to the wavefront, not fail Mosaic allocation)."""
    from sigsvgd_tpu.kernels.pallas_sigkernel import pallas_supported

    assert pallas_supported(40, 40, 3)       # flagship MPC shape
    assert pallas_supported(1000, 48, 3)     # bands stream: lx1 unbounded
    assert not pallas_supported(5, 100, 3)   # ly1 row buffers would blow VMEM
    assert not pallas_supported(40, 40, 4)   # wrong dyadic order


def test_fused_supported_grad_precision_envelope():
    """ADVICE r3: the bf16 backward runs full [16,128] tiles with fp32
    statics scratch — shapes the fp32 envelope admits (ly1=48, C=8) exceed
    VMEM there, so the eligibility check must be grad_precision-aware."""
    from sigsvgd_tpu.kernels.pallas_sigkernel import fused_supported

    # fp32 envelope boundary: admitted
    assert fused_supported(48, 48, 3, 8, "rbf", 1.0)
    assert fused_supported(48, 48, 3, 8, "rbf", 1.0, "fp32")
    # same shape under bf16: rejected (would not fit VMEM)
    assert not fused_supported(48, 48, 3, 8, "rbf", 1.0, "bf16")
    assert not fused_supported(39, 39, 3, 5, "rbf", 1.0, "bf16")
    # flagship MPC shape fits both routes
    assert fused_supported(39, 39, 3, 2, "rbf", 1.0, "bf16")
    assert fused_supported(40, 40, 3, 4, "rbf", 1.0, "bf16")


def test_bf16_oversize_shape_falls_back_to_fp32_fused(rng):
    """grad_precision='bf16' on a shape outside the bf16 envelope silently
    upgrades the adjoint to fp32 (still fused) instead of erroring."""
    from sigsvgd_tpu.kernels.sigkernel import SignatureKernel

    X = jnp.asarray(np.cumsum(
        rng.standard_normal((4, 8, 5)).astype(np.float32) * 0.3, axis=1))
    k16 = SignatureKernel(dyadic_order=3, bandwidth=2.0,
                          grad_precision="bf16")
    k32 = SignatureKernel(dyadic_order=3, bandwidth=2.0)
    K16, d16 = k16.gram_and_grad(X)
    K32, d32 = k32.gram_and_grad(X)
    np.testing.assert_allclose(np.asarray(K16), np.asarray(K32),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(d16), np.asarray(d32),
                               rtol=1e-6, atol=1e-6)
