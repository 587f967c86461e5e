"""Kernel Gram/gradient tests: closed forms + autodiff cross-checks."""
import jax
import jax.numpy as jnp
import numpy as np

from sigsvgd_tpu.kernels import (
    GaussianKernel,
    IMQKernel,
    ScaledGaussianKernel,
    ScaledIMQKernel,
)


def _autograd_dk(kernel, x, **kw):
    """Σ_j ∂k(x_i, y_j)/∂x_i via autodiff with the second argument detached."""

    def total(xx):
        return jnp.sum(kernel(xx, jax.lax.stop_gradient(x), compute_grad=False, **kw))

    return jax.grad(total)(x)


def test_gaussian_closed_form(rng):
    x = jnp.asarray(rng.standard_normal((5, 3)).astype(np.float32))
    k, dk = GaussianKernel()(x, x, h=1.3)
    d2 = np.asarray(
        ((np.asarray(x)[:, None] - np.asarray(x)[None]) ** 2).sum(-1)
    )
    np.testing.assert_allclose(np.asarray(k), np.exp(-0.5 * d2 / 1.3**2), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dk), np.asarray(_autograd_dk(GaussianKernel(), x, h=1.3)),
        rtol=1e-4, atol=1e-5,
    )


def test_gaussian_median_bandwidth_diag_is_one(rng):
    x = jnp.asarray(rng.standard_normal((8, 2)).astype(np.float32))
    k, _ = GaussianKernel()(x, x)
    np.testing.assert_allclose(np.asarray(jnp.diag(k)), 1.0, atol=1e-6)


def test_scaled_gaussian_reduces_to_gaussian(rng):
    x = jnp.asarray(rng.standard_normal((6, 4)).astype(np.float32))
    k_plain, dk_plain = GaussianKernel()(x, x, h=0.9)
    k_scaled, dk_scaled = ScaledGaussianKernel()(x, x, M=jnp.eye(4), h=0.9)
    np.testing.assert_allclose(np.asarray(k_plain), np.asarray(k_scaled), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dk_plain), np.asarray(dk_scaled), rtol=1e-4, atol=1e-5
    )


def test_scaled_gaussian_grad_vs_autodiff(rng):
    x = jnp.asarray(rng.standard_normal((5, 3)).astype(np.float32))
    a = rng.standard_normal((3, 3)).astype(np.float32)
    metric = jnp.asarray(a @ a.T + np.eye(3, dtype=np.float32))
    kern = ScaledGaussianKernel()
    _, dk = kern(x, x, M=metric, h=1.1)
    dk_auto = _autograd_dk(kern, x, M=metric, h=1.1)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_auto), rtol=1e-4, atol=1e-5)


def test_imq_closed_form_and_grad(rng):
    x = jnp.asarray(rng.standard_normal((5, 3)).astype(np.float32))
    kern = IMQKernel()
    k, dk = kern(x, x, h=0.8)
    d2 = ((np.asarray(x)[:, None] - np.asarray(x)[None]) ** 2).sum(-1)
    np.testing.assert_allclose(
        np.asarray(k), (1 + 0.5 * d2 / 0.8**2) ** -0.5, rtol=1e-5
    )
    dk_auto = _autograd_dk(kern, x, h=0.8)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_auto), rtol=1e-4, atol=1e-5)


def test_scaled_imq_grad_vs_autodiff(rng):
    x = jnp.asarray(rng.standard_normal((4, 3)).astype(np.float32))
    a = rng.standard_normal((3, 3)).astype(np.float32)
    metric = jnp.asarray(a @ a.T + np.eye(3, dtype=np.float32))
    kern = ScaledIMQKernel()
    _, dk = kern(x, x, M=metric, h=1.0)
    dk_auto = _autograd_dk(kern, x, M=metric, h=1.0)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_auto), rtol=1e-4, atol=1e-5)


def test_kernels_flatten_high_rank_inputs(rng):
    x = jnp.asarray(rng.standard_normal((5, 4, 2)).astype(np.float32))
    k, dk = GaussianKernel()(x, x)
    assert k.shape == (5, 5)
    assert dk.shape == (5, 8)
