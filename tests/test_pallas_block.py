"""Block-structured λ=0 fused Gram+gradient kernel (interpret mode on CPU).

Reference semantics: the same FD scheme as the reference's ``sigkernel``
dependency (``_traj_kernels.py:198-206``) at ``dyadic_order=0``; the output
contract is ``SignatureKernel.gram_and_grad`` — K plus the halved full-sum
pull-back the Stein velocity consumes (``trajectory_svgd.py:55-69``).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from sigsvgd_tpu.kernels.pallas_sigkernel_block import (
    block_gram_and_grad,
    block_supported,
)
from sigsvgd_tpu.kernels.sigkernel import SignatureKernel


@pytest.mark.parametrize(
    "n,L,C,h",
    [
        (20, 9, 2, 4.0),     # multi-tile row dimension
        (7, 5, 3, 2.0),      # n < one row block: padding mask on both axes
        (130, 6, 2, 3.0),    # n > one col block: off-diagonal seed-2 tiles
        (33, 21, 3, 4.0),    # odd n, multi-band adjoint (lx1 > R)
    ],
)
def test_block_matches_wavefront(rng, n, L, C, h):
    X = jnp.asarray(rng.normal(size=(n, L, C)).astype(np.float32) * 0.3)
    K, dX = block_gram_and_grad(X, jnp.asarray(h, jnp.float32))
    kw = SignatureKernel(dyadic_order=0, bandwidth=h, solver="wavefront")
    Kw, dXw = kw.gram_and_grad(X)
    np.testing.assert_allclose(np.asarray(K), np.asarray(Kw), atol=3e-5)
    scale = float(np.abs(np.asarray(dXw)).max())
    np.testing.assert_allclose(
        np.asarray(dX) / scale, np.asarray(dXw) / scale, atol=5e-5
    )


def test_block_k_symmetric_and_diag_geq_one(rng):
    X = jnp.asarray(rng.normal(size=(40, 7, 2)).astype(np.float32) * 0.2)
    K, _ = block_gram_and_grad(X, jnp.asarray(2.0, jnp.float32))
    K = np.asarray(K)
    np.testing.assert_allclose(K, K.T, atol=2e-5)
    # K(x, x) = ||S(x)||^2 = 1 + positive signature terms
    assert np.all(np.diag(K) >= 1.0 - 3e-5)


def test_signature_kernel_routes_to_block(rng):
    """gram_and_grad takes the block path for eligible λ=0 shapes and the
    result matches the wavefront route (median bandwidth exercised)."""
    n, L, C = 24, 11, 2
    X = jnp.asarray(rng.normal(size=(n, L, C)).astype(np.float32) * 0.3)
    k_small = SignatureKernel(dyadic_order=0, bandwidth=3.0,
                              solver="pallas_small")
    assert k_small._solver_kind(L - 1, L - 1) == "pallas_small"
    assert block_supported(n, L, C, "rbf", True)
    K_s, dX_s = k_small.gram_and_grad(X)
    k_wave = SignatureKernel(dyadic_order=0, bandwidth=3.0, solver="wavefront")
    K_w, dX_w = k_wave.gram_and_grad(X)
    np.testing.assert_allclose(np.asarray(K_s), np.asarray(K_w), atol=3e-5)
    scale = float(np.abs(np.asarray(dX_w)).max())
    np.testing.assert_allclose(
        np.asarray(dX_s) / scale, np.asarray(dX_w) / scale, atol=5e-5
    )


def test_block_supported_envelope():
    assert block_supported(1024, 40, 2, "rbf", 4.0)
    assert not block_supported(64, 40, 2, "linear", None)   # statics
    assert not block_supported(64, 40, 2, "rbf", None)      # bandwidth
    assert not block_supported(64, 40, 9, "rbf", 4.0)       # channels
    assert not block_supported(64, 65, 2, "rbf", 4.0)       # L*C lane tile
    assert not block_supported(64, 43, 3, "rbf", 4.0)       # L*C = 129


def test_block_tiles_ks_partial_matches_full(rng):
    """Sharded tile subsets: per-device K@s + pull-back partials summed over
    the shard equal the full-schedule gram_and_grad (K@s formed without
    materializing K; dX halved by the caller)."""
    import jax.numpy as jnp
    from sigsvgd_tpu.kernels.pallas_sigkernel_block import (
        block_tile_shard, block_tiles_ks_partial,
    )

    n, L, C, d = 70, 9, 2, 5
    X = jnp.asarray(rng.normal(size=(n, L, C)).astype(np.float32) * 0.3)
    s = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    h = jnp.asarray(3.0, jnp.float32)
    K, dX = block_gram_and_grad(X, h)
    want_ks = np.asarray(K @ s)
    I, J, S, W = block_tile_shard(n, 3)
    ks_sum = dx_sum = 0.0
    for dev in range(3):
        ks_p, dx_p = block_tiles_ks_partial(
            X, h, s, jnp.asarray(I[dev]), jnp.asarray(J[dev]),
            jnp.asarray(S[dev]), jnp.asarray(W[dev]),
        )
        ks_sum = ks_sum + ks_p
        dx_sum = dx_sum + dx_p
    np.testing.assert_allclose(
        np.asarray(ks_sum)[:n], want_ks, rtol=2e-4, atol=2e-5
    )
    scale = float(np.abs(np.asarray(dX)).max())
    np.testing.assert_allclose(
        np.asarray(0.5 * dx_sum[:n]) / scale, np.asarray(dX) / scale,
        atol=5e-6,
    )
