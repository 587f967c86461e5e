"""Block-structured dyadic-3 fused Gram+gradient (interpret mode on CPU).

Reference semantics: the same FD scheme/coefficients as the reference's
``sigkernel`` dependency at ``dyadic_order=3``
(``_traj_kernels.py:198-206``); the PDE sweeps are the production band
kernels' (imported), only the statics plumbing is block-structured.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from sigsvgd_tpu.kernels.pallas_sigkernel_block3 import (
    block3_gram_and_grad,
    block3_supported,
    block3_tiles_ks_partial,
)
from sigsvgd_tpu.kernels.sigkernel import SignatureKernel


@pytest.mark.parametrize(
    "n,L,C,h",
    [
        (20, 9, 2, 4.0),     # multi-tile row dimension
        (7, 5, 3, 2.0),      # n < one row block: padding on both axes
        (12, 13, 2, 3.0),    # longer paths, multi-checkpoint backward
    ],
)
def test_block3_matches_wavefront(rng, n, L, C, h):
    X = jnp.asarray(rng.normal(size=(n, L, C)).astype(np.float32) * 0.3)
    K, dX = block3_gram_and_grad(X, jnp.asarray(h, jnp.float32))
    kw = SignatureKernel(dyadic_order=3, bandwidth=h, solver="wavefront")
    Kw, dXw = kw.gram_and_grad(X)
    np.testing.assert_allclose(np.asarray(K), np.asarray(Kw), atol=1e-4)
    scale = float(np.abs(np.asarray(dXw)).max())
    # the fast backward's right-to-left primal reconstruction carries ~1e-4
    # relative drift at fp32 (pallas_sigkernel.py module docstring)
    np.testing.assert_allclose(
        np.asarray(dX) / scale, np.asarray(dXw) / scale, atol=4e-4
    )


def test_signature_kernel_routes_to_block3(rng):
    """gram_and_grad takes the dyadic-3 block route when the pallas solver
    is selected and the shape fits; matches the wavefront route."""
    n, L, C = 24, 11, 2
    X = jnp.asarray(rng.normal(size=(n, L, C)).astype(np.float32) * 0.3)
    kp = SignatureKernel(dyadic_order=3, bandwidth=3.0, solver="pallas")
    assert kp._solver_kind(L - 1, L - 1) == "pallas"
    assert block3_supported(n, L, C, "rbf", True)
    K_p, dX_p = kp.gram_and_grad(X)
    kw = SignatureKernel(dyadic_order=3, bandwidth=3.0, solver="wavefront")
    K_w, dX_w = kw.gram_and_grad(X)
    np.testing.assert_allclose(np.asarray(K_p), np.asarray(K_w), atol=1e-4)
    scale = float(np.abs(np.asarray(dX_w)).max())
    np.testing.assert_allclose(
        np.asarray(dX_p) / scale, np.asarray(dX_w) / scale, atol=4e-4
    )


def test_block3_tiles_ks_partial_matches_full(rng):
    """Sharded tile subsets: partials summed over the shard equal the
    full-schedule gram_and_grad."""
    from sigsvgd_tpu.kernels.pallas_sigkernel_block import block_tile_shard

    n, L, C, d = 40, 7, 2, 5
    X = jnp.asarray(rng.normal(size=(n, L, C)).astype(np.float32) * 0.3)
    s = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    h = jnp.asarray(3.0, jnp.float32)
    K, dX = block3_gram_and_grad(X, h)
    want_ks = np.asarray(K @ s)
    I, J, S, W = block_tile_shard(n, 3)
    ks_sum = dx_sum = 0.0
    for dev in range(3):
        ks_p, dx_p = block3_tiles_ks_partial(
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
        atol=1e-5,
    )


def test_block3_supported_envelope():
    assert block3_supported(1024, 41, 2, "rbf", 4.0)
    assert not block3_supported(64, 41, 2, "linear", None)   # statics
    assert not block3_supported(64, 41, 2, "rbf", None)      # bandwidth
    assert not block3_supported(64, 50, 2, "rbf", 4.0)       # ly1 > 48
    assert not block3_supported(64, 41, 4, "rbf", 4.0)       # L*C > 128
