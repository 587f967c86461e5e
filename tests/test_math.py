"""Golden-value tests for the math utilities (naive numpy oracles, fp64)."""
import jax.numpy as jnp
import numpy as np

from sigsvgd_tpu.utils import math as m


def test_pw_dist_sq_matches_naive(rng):
    x = rng.standard_normal((7, 3)).astype(np.float32)
    y = rng.standard_normal((5, 3)).astype(np.float32)
    got = np.asarray(m.pw_dist_sq(jnp.asarray(x), jnp.asarray(y)))
    want = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_scaled_pw_dist_sq_matches_naive(rng):
    x = rng.standard_normal((6, 4)).astype(np.float32)
    y = rng.standard_normal((6, 4)).astype(np.float32)
    a = rng.standard_normal((4, 4)).astype(np.float32)
    metric = a @ a.T  # PSD
    got, grad = m.scaled_pw_dist_sq(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(metric), return_gradient=True
    )
    want = np.empty((6, 6))
    for i in range(6):
        for j in range(6):
            d = x[i] - y[j]
            want[i, j] = d @ metric @ d
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(grad)[2, 3], (x[2] - y[3]) @ metric, rtol=1e-4, atol=1e-5
    )


def test_bw_median(rng):
    # torch.median semantics (reference parity): LOWER-middle order statistic
    # for even element counts, not numpy's interpolated median
    d2 = np.abs(rng.standard_normal((10, 10))).astype(np.float32)
    got = float(m.bw_median(jnp.asarray(d2)))
    lower_mid = np.sort(d2.ravel())[(d2.size - 1) // 2]
    want = np.sqrt(lower_mid / np.log(11.0))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # odd count: agrees with numpy's median exactly
    d2o = d2.ravel()[:81].reshape(9, 9)
    np.testing.assert_allclose(
        float(m.bw_median(jnp.asarray(d2o))),
        np.sqrt(np.median(d2o) / np.log(10.0)),
        rtol=1e-5,
    )


def test_gmm_log_prob_matches_scipy_style(rng):
    means = rng.standard_normal((4, 2)).astype(np.float32)
    samples = rng.standard_normal((6, 2)).astype(np.float32)
    var = 0.5
    w = np.ones(4, dtype=np.float32)
    got = np.asarray(
        m.gmm_log_prob(jnp.asarray(samples), jnp.asarray(means), var, jnp.asarray(w))
    )
    # naive fp64 oracle
    comp = np.zeros((6, 4))
    for k in range(4):
        diff = samples - means[k]
        comp[:, k] = (
            -0.5 * (diff**2).sum(-1) / var - np.log(2 * np.pi * var)
        )
    want = np.log(np.exp(comp).mean(axis=1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_exact_gmm_grad_vs_finite_difference(rng):
    means = rng.standard_normal((3, 2)).astype(np.float32)
    x = rng.standard_normal((2, 2)).astype(np.float32)
    w = np.ones(3, dtype=np.float32)
    var = 0.7
    g = np.asarray(
        m.exact_grad_gmm_log_p(jnp.asarray(x), jnp.asarray(means), var, jnp.asarray(w))
    )
    eps = 1e-3
    for d in range(2):
        xp = x.copy()
        xp[0, d] += eps
        xm = x.copy()
        xm[0, d] -= eps
        lp = m.gmm_log_prob(jnp.asarray(xp), jnp.asarray(means), var, jnp.asarray(w))
        lm = m.gmm_log_prob(jnp.asarray(xm), jnp.asarray(means), var, jnp.asarray(w))
        fd = (float(lp[0]) - float(lm[0])) / (2 * eps)
        np.testing.assert_allclose(g[0, d], fd, rtol=1e-2, atol=1e-3)


def test_approx_gmm_grad_shape_and_sanity(rng):
    means = rng.standard_normal((3, 2, 2)).astype(np.float32)  # event shape (2,2)
    x = rng.standard_normal((5, 2, 2)).astype(np.float32)
    w = np.ones(3, dtype=np.float32)
    g = m.grad_gmm_log_p(jnp.asarray(x), jnp.asarray(means), 1.0, jnp.asarray(w))
    assert g.shape == x.shape
    # pulls samples toward the mean of the mixture
    pull = np.asarray(g) * (means.mean(0)[None] - x)
    assert pull.sum() > 0


def test_smoothed_box_log_prob():
    low = jnp.asarray([-1.0, -1.0])
    high = jnp.asarray([1.0, 1.0])
    inside = m.smoothed_box_log_prob(jnp.asarray([[0.0, 0.0]]), low, high, 0.1)
    edge = m.smoothed_box_log_prob(jnp.asarray([[1.0, 0.0]]), low, high, 0.1)
    outside = m.smoothed_box_log_prob(jnp.asarray([[1.5, 0.0]]), low, high, 0.1)
    assert float(inside[0]) == float(edge[0])  # flat inside the box
    assert float(outside[0]) < float(inside[0]) - 5.0  # strong decay outside
