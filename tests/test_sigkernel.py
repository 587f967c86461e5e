"""Goursat-PDE signature-kernel tests.

Oracles:
  1. a naive fp64 numpy row-by-row PDE solver (same finite-difference scheme),
  2. the truncated-signature inner product (linear static kernel): for smooth
     short paths  k_sig(x, y) ≈ <S(x), S(y)> summed over levels (+1 for the
     empty word) — the cross-validation the reference does in
     ``examples/test_pathsig_kernel.ipynb``.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigsvgd_tpu.kernels import (
    SignatureKernel,
    batch_signature,
    gram_increments,
    solve_goursat_pde,
    static_gram_linear,
)


def _naive_pde(inc, lam):
    """fp64 row-major reference solver (O(G²) sequential)."""
    inc = np.asarray(inc, np.float64) / 4.0**lam
    lx, ly = inc.shape
    gx, gy = lx * 2**lam, ly * 2**lam
    k = np.ones((gx + 1, gy + 1))
    for i in range(1, gx + 1):
        for j in range(1, gy + 1):
            z = inc[(i - 1) >> lam, (j - 1) >> lam]
            a = 1 + 0.5 * z + z * z / 12
            b = 1 - z * z / 12
            k[i, j] = (k[i, j - 1] + k[i - 1, j]) * a - k[i - 1, j - 1] * b
    return k[gx, gy]


def test_wavefront_matches_naive_solver(rng):
    for lam in (0, 1, 2):
        inc = rng.standard_normal((3, 5, 5)).astype(np.float32) * 0.1
        got = np.asarray(solve_goursat_pde(jnp.asarray(inc), lam))
        want = np.array([_naive_pde(inc[b], lam) for b in range(3)])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rectangular_grids(rng):
    inc = rng.standard_normal((2, 4, 7)).astype(np.float32) * 0.1
    got = np.asarray(solve_goursat_pde(jnp.asarray(inc), 1))
    want = np.array([_naive_pde(inc[b], 1) for b in range(2)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_zero_path_gives_one():
    """k(x, y) = 1 when either path is constant (empty signature)."""
    inc = jnp.zeros((1, 6, 6))
    np.testing.assert_allclose(np.asarray(solve_goursat_pde(inc, 3)), 1.0, atol=1e-6)


def test_matches_truncated_signature_inner_product(rng):
    """Linear static kernel ↔ <S(x), S(y)> cross-check (short smooth paths so
    depth-6 truncation captures essentially the whole kernel)."""
    x = rng.standard_normal((4, 6, 2)).astype(np.float32) * 0.3
    xj = jnp.asarray(x)
    g = static_gram_linear(xj, xj)
    inc = gram_increments(g).reshape(16, 5, 5)
    pde = np.asarray(solve_goursat_pde(inc, 4)).reshape(4, 4)

    sigs = np.asarray(batch_signature(xj, depth=6, basepoint=False))
    trunc = 1.0 + sigs @ sigs.T  # +1 for the empty word
    np.testing.assert_allclose(pde, trunc, rtol=2e-3, atol=2e-3)


def test_signature_kernel_gram_properties(rng):
    paths = jnp.asarray(rng.standard_normal((5, 7, 2)).astype(np.float32))
    kern = SignatureKernel(dyadic_order=2, bandwidth=1.0)
    k = kern.gram(paths, paths)
    assert k.shape == (5, 5)
    np.testing.assert_allclose(np.asarray(k), np.asarray(k).T, rtol=1e-4, atol=1e-5)
    # PSD-ish: eigenvalues non-negative up to numerical tolerance
    eig = np.linalg.eigvalsh(np.asarray(k, np.float64))
    assert eig.min() > -1e-4


def test_signature_kernel_grad_finite_difference(rng):
    paths = jnp.asarray(rng.standard_normal((3, 5, 2)).astype(np.float32) * 0.5)
    kern = SignatureKernel(dyadic_order=2, bandwidth=2.0)
    k, dk = kern.gram_and_grad(paths)
    assert dk.shape == paths.shape
    eps = 1e-2
    ref = jax.lax.stop_gradient(paths)

    def total(p):
        return float(jnp.sum(kern.gram(p, ref)))

    fd = (total(paths.at[1, 2, 0].add(eps)) - total(paths.at[1, 2, 0].add(-eps))) / (
        2 * eps
    )
    np.testing.assert_allclose(float(dk[1, 2, 0]), fd, rtol=5e-2, atol=1e-3)


def test_median_bandwidth_path(rng):
    paths = jnp.asarray(rng.standard_normal((4, 6, 2)).astype(np.float32))
    kern = SignatureKernel(dyadic_order=2)  # median heuristic
    k = kern.gram(paths, paths)
    assert np.isfinite(np.asarray(k)).all()


def test_custom_vjp_matches_scan_ad(rng):
    """The production adjoint solver must match AD-through-scan exactly."""
    from sigsvgd_tpu.kernels.sigkernel import solve_goursat_pde_scan

    for lam in (0, 1, 2):
        inc = jnp.asarray(rng.standard_normal((5, 4, 4)).astype(np.float32) * 0.2)
        g = jnp.asarray(rng.standard_normal(5).astype(np.float32))

        k_scan, vjp_scan = jax.vjp(lambda z: solve_goursat_pde_scan(z, lam), inc)
        k_prod, vjp_prod = jax.vjp(lambda z: solve_goursat_pde(z, lam), inc)
        np.testing.assert_allclose(np.asarray(k_scan), np.asarray(k_prod), rtol=1e-6)
        (d_scan,) = vjp_scan(g)
        (d_prod,) = vjp_prod(g)
        np.testing.assert_allclose(
            np.asarray(d_scan), np.asarray(d_prod), rtol=1e-4, atol=1e-5
        )


def test_custom_vjp_rectangular_and_chunked(rng):
    from sigsvgd_tpu.kernels.sigkernel import solve_goursat_pde_scan

    inc = jnp.asarray(rng.standard_normal((7, 3, 5)).astype(np.float32) * 0.2)
    g = jnp.asarray(rng.standard_normal(7).astype(np.float32))
    k_scan, vjp_scan = jax.vjp(lambda z: solve_goursat_pde_scan(z, 1), inc)
    # chunk smaller than batch to exercise the lax.map path (+padding)
    k_prod, vjp_prod = jax.vjp(lambda z: solve_goursat_pde(z, 1, 3), inc)
    np.testing.assert_allclose(np.asarray(k_scan), np.asarray(k_prod), rtol=1e-6)
    (d_scan,) = vjp_scan(g)
    (d_prod,) = vjp_prod(g)
    np.testing.assert_allclose(
        np.asarray(d_scan), np.asarray(d_prod), rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
def test_custom_vjp_large_grid_reconstruction_accuracy(rng):
    """The reverse-reconstruction adjoint at FLAGSHIP grid sizes.

    The backward pass reconstructs primal diagonals by inverting the
    recurrence; fp32 drift over the ~2G-step reverse sweep must stay small at
    the planning scale (L=5, dyadic 6 → 256² grid) and the MPC scale
    (H+1=41, dyadic 3 → 312² grid) or the 1k-particle gradients would rot."""
    from sigsvgd_tpu.kernels.sigkernel import solve_goursat_pde_scan

    for (ln, lam) in ((4, 6), (40, 3)):
        inc = jnp.asarray(rng.standard_normal((4, ln, ln)).astype(np.float32) * 0.1)
        g = jnp.asarray(rng.standard_normal(4).astype(np.float32))
        k_scan, vjp_scan = jax.vjp(lambda z: solve_goursat_pde_scan(z, lam), inc)
        k_prod, vjp_prod = jax.vjp(lambda z: solve_goursat_pde(z, lam), inc)
        np.testing.assert_allclose(
            np.asarray(k_scan), np.asarray(k_prod), rtol=1e-5
        )
        (d_scan,) = vjp_scan(g)
        (d_prod,) = vjp_prod(g)
        # measured vs an fp64 ground truth: both scan-AD and the segmented
        # reconstruction adjoint sit at ~1e-4 normalized error on the 312²
        # grid — compare on the normalized scale with an absolute tolerance
        # (elementwise rtol would demand sub-noise accuracy on near-zero
        # entries)
        scale = np.abs(np.asarray(d_scan)).max()
        np.testing.assert_allclose(
            np.asarray(d_prod) / scale, np.asarray(d_scan) / scale,
            atol=5e-4,
        )


def test_chunked_pairs_gram_matches_dense(rng):
    """The streamed huge-pair path must agree with the dense pipeline
    (values AND gradients) — exercised by forcing the dense limit down."""
    import dataclasses

    from sigsvgd_tpu.kernels.sigkernel import SignatureKernel

    paths = jnp.asarray(rng.standard_normal((6, 5, 2)).astype(np.float32))
    dense = SignatureKernel(dyadic_order=2, bandwidth=1.5)
    small = dataclasses.replace(dense)
    object.__setattr__(small, "_DENSE_LIMIT", 1)  # force chunked path

    k_d, vjp_d = jax.vjp(lambda x: dense.gram(x, jax.lax.stop_gradient(paths)), paths)
    k_c, vjp_c = jax.vjp(lambda x: small._gram_chunked_pairs(x, jax.lax.stop_gradient(paths)), paths)
    np.testing.assert_allclose(np.asarray(k_c), np.asarray(k_d), rtol=1e-5, atol=1e-6)
    g = jnp.asarray(rng.standard_normal((6, 6)).astype(np.float32))
    (d_d,) = vjp_d(g)
    (d_c,) = vjp_c(g)
    np.testing.assert_allclose(np.asarray(d_c), np.asarray(d_d), rtol=1e-4, atol=1e-5)


def test_mxu_block_propagator_matches_wavefront(rng):
    """solve_goursat_pde_mxu vs the wavefront solver: values and AD grads.

    Covers m = 2^λ at λ=4 here; the λ=5 and λ=6-sub-block cases run in the
    slow lane — their (2^λ·3)² reference wavefronts dominate the fast lane.
    Increment magnitudes go up to the RBF static kernel's worst case
    (|inc| ≤ 2).
    """
    _mxu_vs_wavefront_cases(rng, ((4, 0.5, None),))


@pytest.mark.slow
def test_mxu_block_propagator_large_blocks(rng):
    """λ=5 full blocks and λ=6 with block_m=16 (sub-block refinement) vs
    the wavefront."""
    _mxu_vs_wavefront_cases(rng, ((5, 2.0, None), (6, 1.0, 16)))


def _mxu_vs_wavefront_cases(rng, cases):
    from sigsvgd_tpu.kernels.sigkernel import (
        solve_goursat_pde_mxu,
        solve_goursat_pde_scan,
    )

    for lam, scale, block_m in cases:
        inc = jnp.asarray(
            np.clip(rng.standard_normal((3, 3, 4)) * scale, -2, 2).astype(np.float32)
        )
        g = jnp.asarray(rng.standard_normal(3).astype(np.float32))
        k_ref, vjp_ref = jax.vjp(lambda z: solve_goursat_pde_scan(z, lam), inc)
        k_mxu, vjp_mxu = jax.vjp(
            lambda z: solve_goursat_pde_mxu(z, lam, degree=10, block_m=block_m), inc
        )
        # tolerance is set by the WAVEFRONT's fp32 rounding: measured vs fp64,
        # the MXU propagator sits at ~1e-7 relative while the 2G-step fp32
        # wavefront accumulates ~2e-4 relative on O(max|k|) values — so the
        # comparison is normalized by the batch max (kernel values span
        # orders of magnitude within a batch)
        sk = np.abs(np.asarray(k_ref)).max()
        np.testing.assert_allclose(
            np.asarray(k_mxu) / sk, np.asarray(k_ref) / sk, atol=1e-3
        )
        (d_ref,) = vjp_ref(g)
        (d_mxu,) = vjp_mxu(g)
        scale_g = np.abs(np.asarray(d_ref)).max()
        np.testing.assert_allclose(
            np.asarray(d_mxu) / scale_g, np.asarray(d_ref) / scale_g, atol=2e-3
        )


@pytest.mark.slow
def test_signature_kernel_auto_solver_consistency(rng):
    """SignatureKernel with solver=auto (MXU at dyadic 6) must agree with the
    explicit wavefront solver end-to-end (gram_and_grad)."""
    import dataclasses

    paths = jnp.asarray(rng.standard_normal((4, 5, 2)).astype(np.float32) * 0.5)
    auto = SignatureKernel(dyadic_order=6, bandwidth=1.5)  # auto → MXU
    wave = dataclasses.replace(auto, solver="wavefront")
    k_a, dk_a = auto.gram_and_grad(paths)
    k_w, dk_w = wave.gram_and_grad(paths)
    # at dyadic 6 the wavefront runs 512 sequential fp32 steps and its
    # rounding (the looser side — see the fp64 comparison in the MXU test)
    # reaches ~3e-3 relative
    np.testing.assert_allclose(np.asarray(k_a), np.asarray(k_w), rtol=5e-3, atol=1e-3)
    scale_g = np.abs(np.asarray(dk_w)).max()
    np.testing.assert_allclose(
        np.asarray(dk_a) / scale_g, np.asarray(dk_w) / scale_g, atol=5e-3
    )


def test_auto_chunk_is_solver_aware():
    """The streamed-Gram pair-chunk size must be sized by the ACTIVE solver's
    per-pair backward footprint: the MXU block-propagator carries only
    block-hop residuals (not the wavefront adjoint's O(L^2) coefficient
    fields), so its chunks must not be SMALLER than a floor that keeps the
    planning-scale Gram in a handful of lax.map segments."""
    from sigsvgd_tpu.kernels.sigkernel import auto_chunk

    mxu = SignatureKernel(dyadic_order=6, bandwidth=1.5)  # auto -> MXU at 4x4
    assert mxu._solver_kind(4, 4) == "mxu"
    assert mxu._auto_chunk(4, 4) >= 100_000
    # the wavefront fallback keeps the legacy sizing
    wave = SignatureKernel(dyadic_order=6, bandwidth=1.5, solver="wavefront")
    assert wave._solver_kind(4, 4) == "wavefront"
    assert wave._auto_chunk(4, 4) == auto_chunk(4, 4, 6)


@pytest.mark.slow
def test_gram_and_grad_dense_route_matches_pair_route(rng, monkeypatch):
    """Short-path (MXU-eligible) gram_and_grad takes the dense full-Gram
    route; it must agree with the gathered-pair route (the general path) in
    values and pull-back gradient."""
    paths = jnp.asarray(rng.standard_normal((6, 3, 7)).astype(np.float32) * 0.5)
    kern = SignatureKernel(dyadic_order=6, bandwidth=1.5)
    assert kern._dense_grad_ok(paths.shape[0], paths.shape[1] - 1)
    k_d, dk_d = kern.gram_and_grad(paths)

    monkeypatch.setattr(SignatureKernel, "_dense_grad_ok",
                        lambda self, n, lx1: False)
    k_p, dk_p = kern.gram_and_grad(paths)
    np.testing.assert_allclose(np.asarray(k_d), np.asarray(k_p), rtol=2e-5,
                               atol=1e-6)
    scale = np.abs(np.asarray(dk_p)).max()
    np.testing.assert_allclose(
        np.asarray(dk_d) / scale, np.asarray(dk_p) / scale, atol=1e-4
    )
