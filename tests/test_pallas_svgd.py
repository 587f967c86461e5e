"""Fused SVGD velocity Pallas kernel: interpret-mode parity with XLA."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigsvgd_tpu.kernels.pallas_svgd import (
    fused_rbf_velocity_pallas,
    xla_rbf_velocity,
)


@pytest.mark.parametrize(
    "n,d,bn,bc",
    [(100, 17, 32, 64), (64, 128, 64, 64), (257, 7, 128, 256)],
)
def test_pallas_velocity_matches_xla(rng, n, d, bn, bc):
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    h = jnp.asarray(1.3)
    ref = xla_rbf_velocity(x, s, h)
    got = fused_rbf_velocity_pallas(x, s, h, block_n=bn, block_c=bc, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=5e-5)


def test_dispatcher_cpu_path(rng):
    from sigsvgd_tpu.kernels.pallas_svgd import fused_rbf_velocity

    x = jnp.asarray(rng.standard_normal((30, 4)).astype(np.float32))
    s = -x
    phi = fused_rbf_velocity(x, s)  # CPU -> XLA path, median bandwidth
    assert np.isfinite(np.asarray(phi)).all()


def test_svgd_fused_flag_matches_default():
    """SVGD(fused_velocity=True) must match the standard path (CPU -> XLA
    dispatch, same math)."""
    import optax

    from sigsvgd_tpu.inference import SVGD, ScoreResult
    from sigsvgd_tpu.kernels import GaussianKernel

    def score_fn(x, key):
        return ScoreResult(grad_log_p=-x)

    x0 = jax.random.normal(jax.random.PRNGKey(0), (40, 3)) + 1.0
    base = SVGD(kernel=GaussianKernel(), optimizer=optax.adam(0.1))
    fused = SVGD(
        kernel=GaussianKernel(), optimizer=optax.adam(0.1), fused_velocity=True
    )
    xa, _, _ = base.run(x0, score_fn, 30)
    xb, _, _ = fused.run(x0, score_fn, 30)
    np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), rtol=1e-4, atol=1e-5)
