"""Core math utilities: pairwise distances, bandwidth heuristics, GMM helpers.

TPU-native counterparts of the reference's `src/utils/math.py:10-166` —
all pure jittable functions (the analytic GMM gradient subsumes the
reference's C++ `fast_gmm_diff` module; under `jit` XLA fuses it into a
handful of elementwise ops + reductions).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def safe_norm(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2 norm with a finite gradient at zero (``jnp.linalg.norm`` yields NaN
    grads when its argument vanishes — e.g. SDF queries exactly inside a box,
    touching capsules, repeated trajectory points)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + eps)


def pw_dist_sq(x: jax.Array, y: jax.Array) -> jax.Array:
    """Pairwise squared Euclidean distances between rows of ``x`` and ``y``.

    Args:
      x: ``[n, d]`` matrix.
      y: ``[m, d]`` matrix.

    Returns:
      ``[n, m]`` matrix of squared distances, clamped to be non-negative.

    The ``x@y^T`` form keeps the FLOPs in a single MXU matmul instead of a
    broadcasted ``[n, m, d]`` difference tensor (parity:
    reference ``src/utils/math.py:69-86``).
    """
    xn = jnp.sum(x * x, axis=-1, keepdims=True)
    yn = jnp.sum(y * y, axis=-1, keepdims=True)
    # full fp32 MXU precision: bandwidth heuristics are sensitive to the
    # bf16 default on small distances
    d2 = xn + yn.T - 2.0 * jnp.matmul(x, y.T, precision="highest")
    return jnp.maximum(d2, 0.0)


def scaled_pw_dist_sq(
    x: jax.Array, y: jax.Array, metric: jax.Array, return_gradient: bool = False
):
    """Metric-scaled pairwise squared distances ``(x_i - y_j) M (x_i - y_j)^T``.

    Args:
      x: ``[n, d]``.
      y: ``[m, d]``.
      metric: ``[d, d]`` metric matrix ``M``.
      return_gradient: if True, also return ``diff @ M`` (``[n, m, d]``), which
        is half the gradient of the squared distance w.r.t. ``x_i`` when ``M``
        is symmetric.

    Parity: reference ``src/utils/math.py:116-144``.
    """
    diff = x[:, None, :] - y[None, :, :]
    diff_m = diff @ metric
    d2 = jnp.maximum(jnp.sum(diff_m * diff, axis=-1), 0.0)
    if return_gradient:
        return d2, diff_m
    return d2


def bw_median(sq_dists: jax.Array, bw_scale: float = 1.0, tol: float = 1e-8) -> jax.Array:
    """Median-heuristic kernel bandwidth.

    ``h = bw_scale * sqrt(median(d²) / log(n + 1))`` clamped to ``tol``
    (parity: reference ``src/utils/math.py:28-34``). Data-dependent but
    shape-static, so it is fine inside ``jit``.

    The median is ``torch.median``'s convention — the LOWER of the two middle
    order statistics for even counts (``jnp.median`` would interpolate);
    verified bit-comparable in ``test_reference_parity.py``.
    """
    n = sq_dists.shape[0]
    flat = sq_dists.reshape(-1)
    k = (flat.shape[0] - 1) // 2
    med = jnp.partition(flat, k)[k]
    return bw_from_median(med, n, bw_scale, tol)


def bw_from_median(med: jax.Array, n: int, bw_scale: float = 1.0,
                   tol: float = 1e-8) -> jax.Array:
    """``h = bw_scale * sqrt(med / log(n + 1))`` clamped to ``tol`` — the
    bandwidth formula of :func:`bw_median` applied to an externally computed
    median (the sharded kernels compute it with a distributed bisection)."""
    h2 = med / jnp.log(n + 1.0)
    return jnp.maximum(bw_scale * jnp.sqrt(h2), tol)


def bw_median_diff(sq_dists: jax.Array, bw_scale: float = 1.0,
                   tol: float = 1e-8) -> jax.Array:
    """:func:`bw_median` with a DEFINED gradient tie-break.

    Same value, but the gradient is routed through the FIRST element (in
    row-major order) equal to the median. A pairwise-distance matrix always
    carries the median value twice (d²[i,j] = d²[j,i]), and which twin
    ``jnp.partition``'s subgradient lands on is an XLA implementation detail
    — torch breaks the same tie differently too (see the fixed-bandwidth
    notes in tests/test_reference_parity.py). Pinning the choice row-major
    makes the single-device gradient reproducible AND identical to the
    sharded ``parallel.svgd.distributed_median_diff`` (whose owner rule is
    lowest shard, then local row-major)."""
    n = sq_dists.shape[0]
    flat = sq_dists.reshape(-1)
    fs = lax.stop_gradient(flat)
    k = (fs.shape[0] - 1) // 2
    med_val = jnp.partition(fs, k)[k]
    idx = jnp.argmax(fs == med_val)
    return bw_from_median(flat[idx], n, bw_scale, tol)


def bw_silverman(x: jax.Array, bw_scale: float = 1.0) -> jax.Array:
    """Silverman's rule-of-thumb bandwidth over axis 0 of ``x``.

    ``0.9 * A * n^(-1/5)`` with ``A = min(std, IQR/1.349)``; follows the
    statsmodels variant the reference uses (``src/utils/math.py:10-66``)
    exactly: the IQR is a *scalar* over the flattened array (scipy
    ``scoreatpercentile`` default axis=None) and is only used when positive
    and smaller than the smallest per-column std, else the per-column std
    vector is returned. Verified against the reference in
    ``test_reference_parity.py``.
    """
    n = x.shape[0]
    flat = x.reshape(-1)
    q75 = jnp.percentile(flat, 75)
    q25 = jnp.percentile(flat, 25)
    iqr = (q75 - q25) / 1.349
    std = jnp.std(x, axis=0, ddof=1)
    use_iqr = jnp.logical_and(iqr > 0, iqr < jnp.min(std))
    a = jnp.where(use_iqr, jnp.broadcast_to(iqr, std.shape), std)
    return bw_scale * 0.9 * a * n ** (-0.2)


# ---------------------------------------------------------------------------
# Gaussian mixtures over particles (the DuSt/MPF policy prior).
# ---------------------------------------------------------------------------


def gmm_log_prob(
    samples: jax.Array, means: jax.Array, var: jax.Array, weights: jax.Array
) -> jax.Array:
    """Log-density of an isotropic-per-dim GMM built on particle ``means``.

    Args:
      samples: ``[s, *event]`` query points.
      means: ``[k, *event]`` component means (one per particle).
      var: scalar or ``[*event]`` per-dimension variance shared by components.
      weights: ``[k]`` unnormalized component weights.

    Returns:
      ``[s]`` log-probabilities.
    """
    s = samples.reshape(samples.shape[0], -1)
    m = means.reshape(means.shape[0], -1)
    v = jnp.broadcast_to(jnp.asarray(var), (m.shape[-1],))
    logw = jax.nn.log_softmax(jnp.log(weights))
    diff = s[:, None, :] - m[None, :, :]
    quad = -0.5 * jnp.sum(diff * diff / v, axis=-1)
    log_norm = -0.5 * jnp.sum(jnp.log(2.0 * jnp.pi * v))
    return jax.nn.logsumexp(logw[None, :] + quad + log_norm, axis=-1)


def grad_gmm_log_p(
    samples: jax.Array, means: jax.Array, var: jax.Array, weights: jax.Array
) -> jax.Array:
    """Analytic *unweighted-responsibility* GMM prior gradient.

    This mirrors the reference's fast approximation
    (``src/utils/math.py:155-166`` and the C++ ``fast_gmm_diff`` it motivated,
    ``docs/Benchmark.md:28-61``): ``grad_i = Σ_k -w_k (x_i - μ_k) / σ²`` using
    mixture *weights* (not posterior responsibilities). On TPU this is one
    fused broadcast-multiply-reduce.

    Args/shapes as in :func:`gmm_log_prob`; returns ``samples``-shaped grads.
    """
    ss = samples.shape
    s = samples.reshape(samples.shape[0], -1)
    m = means.reshape(means.shape[0], -1)
    v = jnp.broadcast_to(jnp.asarray(var), (m.shape[-1],))
    w = weights / jnp.sum(weights)
    # Σ_k -w_k (x - μ_k)/σ² = -(x - w@μ)/σ² — closed form, no [s, k, d] tensor
    grad = -(s - jnp.matmul(w[None, :], m, precision="highest")) / v
    return grad.reshape(ss)


def exact_grad_gmm_log_p(
    samples: jax.Array, means: jax.Array, var: jax.Array, weights: jax.Array
) -> jax.Array:
    """Exact ``∇_x log p_GMM(x)`` via autodiff of :func:`gmm_log_prob`."""
    g = jax.grad(lambda x: jnp.sum(gmm_log_prob(x, means, var, weights)))
    return g(samples)


def smoothed_box_log_prob(
    x: jax.Array, low: jax.Array, high: jax.Array, sigma: float = 0.1
) -> jax.Array:
    """Gaussian-smoothed uniform-box log-density (un-normalized inside the box).

    Replaces ``gpytorch.priors.SmoothedBoxPrior`` (used as the action/joint
    limit hyper-prior, reference ``src/controllers/dust.py:124-130``):

      ``log p(x) = Σ_d [ -0.5 ((|x_d - c_d| - w_d)_+ / σ)² ] - log Z_d``

    with ``c = (low+high)/2``, ``w = (high-low)/2`` and
    ``Z_d = (high_d - low_d) + sqrt(2πσ²)``.
    """
    low = jnp.asarray(low)
    high = jnp.asarray(high)
    center = 0.5 * (low + high)
    half_width = 0.5 * (high - low)
    out_dist = jnp.maximum(jnp.abs(x - center) - half_width, 0.0)
    log_z = jnp.log(2.0 * half_width + jnp.sqrt(2.0 * jnp.pi) * sigma)
    return jnp.sum(-0.5 * (out_dist / sigma) ** 2 - log_z, axis=-1)


@partial(jax.jit, static_argnames=("lower",))
def cholesky_psd(m: jax.Array, jitter: float = 1e-8, lower: bool = True) -> jax.Array:
    """Cholesky with a small diagonal jitter for numerical robustness."""
    d = m.shape[-1]
    return jnp.linalg.cholesky(m + jitter * jnp.eye(d, dtype=m.dtype)) if lower else (
        jnp.linalg.cholesky(m + jitter * jnp.eye(d, dtype=m.dtype)).T
    )
