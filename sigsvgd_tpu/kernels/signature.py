"""Truncated path-signature transform and the path-signature RBF kernel.

TPU-native replacement for the reference's `signatory` C++/CUDA dependency
(used by ``src/kernels/_traj_kernels.py:72-144``): the depth-``d`` signature is
computed with Chen's identity as a ``lax.scan`` over path increments, holding
the truncated tensor algebra as flattened per-degree vectors. Fully
differentiable (JAX AD through the scan) and vmap-friendly.
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .rbf import BaseKernel, GaussianKernel


def _outer(a: jax.Array, b: jax.Array) -> jax.Array:
    """Flattened tensor product of flattened tensors."""
    return (a[:, None] * b[None, :]).reshape(-1)


def signature(path: jax.Array, depth: int, basepoint: bool = True) -> jax.Array:
    """Truncated signature ``S(path, depth)`` of a single path ``[L, C]``.

    Returns the flattened levels ``[C + C² + … + C^depth]`` (same layout and
    semantics as ``signatory.signature(X, depth, basepoint=True)``: with
    ``basepoint`` an initial zero point is prepended, making the transform
    translation-sensitive).
    """
    if path.ndim != 2:
        raise ValueError("signature expects a single path of shape [L, C]")
    c = path.shape[-1]
    if basepoint:
        incs = jnp.diff(path, axis=0, prepend=jnp.zeros((1, c), path.dtype))
    else:
        incs = jnp.diff(path, axis=0)

    inv_fact = [1.0 / math.factorial(k) for k in range(depth + 1)]

    def seg_exp(delta: jax.Array) -> Tuple[jax.Array, ...]:
        """Levels of exp(δ): ``δ^{⊗k}/k!`` for k=1..depth, flattened."""
        levels = [delta]
        for _ in range(depth - 1):
            levels.append(_outer(levels[-1], delta))
        return tuple(lv * inv_fact[k + 1] for k, lv in enumerate(levels))

    def chen(sig: Tuple[jax.Array, ...], exp_lv: Tuple[jax.Array, ...]):
        """Chen's identity: levels of ``sig ⊗ exp(δ)``."""
        out = []
        for k in range(depth):  # degree k+1
            term = sig[k] + exp_lv[k]
            for i in range(k):  # sig degree i+1 ⊗ exp degree k-i
                term = term + _outer(sig[i], exp_lv[k - i - 1])
            out.append(term)
        return tuple(out)

    def step(sig, delta):
        return chen(sig, seg_exp(delta)), None

    init = tuple(jnp.zeros((c ** (k + 1),), path.dtype) for k in range(depth))
    first = seg_exp(incs[0])
    sig, _ = lax.scan(step, first, incs[1:])
    return jnp.concatenate(sig)


@partial(jax.jit, static_argnames=("depth", "basepoint"))
def batch_signature(paths: jax.Array, depth: int, basepoint: bool = True) -> jax.Array:
    """Signatures of a batch of paths ``[..., L, C]`` → ``[..., sig_dim]``."""
    flat = paths.reshape((-1,) + paths.shape[-2:])
    sigs = jax.vmap(lambda p: signature(p, depth, basepoint))(flat)
    return sigs.reshape(paths.shape[:-2] + sigs.shape[-1:])


def sig_dim(channels: int, depth: int) -> int:
    return sum(channels**k for k in range(1, depth + 1))


@dataclasses.dataclass(frozen=True)
class PathSigKernel(BaseKernel):
    """Static RBF kernel on truncated-signature features.

    ``k(X, Y) = κ(S(X, d), S(Y, d))`` — the reference's ``PathSigKernel``
    (``_traj_kernels.py:72-144``). ``__call__`` takes paths
    ``[batch, L, C]`` and returns ``(K, dK)`` where ``dK`` is the gradient of
    ``ΣK`` w.r.t. the *first* path argument (autodiff through the signature
    scan), or just ``K`` with ``compute_grad=False``.
    """

    static_kernel: BaseKernel = dataclasses.field(default_factory=GaussianKernel)
    depth: int = 3

    def gram(self, X: jax.Array, Y: jax.Array, h=None) -> jax.Array:
        xs = batch_signature(X, self.depth)
        ys = batch_signature(Y, self.depth)
        return self.static_kernel(xs, ys, h=h, compute_grad=False)

    def __call__(self, X, Y, h=None, compute_grad: bool = True, **_):
        if not compute_grad:
            return self.gram(X, Y, h)

        def total(x):
            k = self.gram(x, lax.stop_gradient(Y), h)
            return jnp.sum(k), k

        (_, K), dK = jax.value_and_grad(total, has_aux=True)(X)
        return K, dK
