import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax
import jax.numpy as jnp

from sigsvgd_tpu.kernels.pallas_sigkernel import _P, pallas_pair_gram_fused

rng = np.random.default_rng(0)
n, L, C = 6, 5, 2
X = 0.4 * jnp.asarray(np.cumsum(rng.standard_normal((n, L, C)), 1).astype(np.float32))
ix = jnp.asarray(rng.integers(0, n, _P).astype(np.int32))
iy = jnp.asarray(rng.integers(0, n, _P).astype(np.int32))
h = jnp.float32(2.0)
g = jnp.asarray(rng.standard_normal(_P).astype(np.float32))

v32, vjp32 = jax.vjp(lambda x: pallas_pair_gram_fused(x, x, ix, iy, h), X)
v16, vjp16 = jax.vjp(
    lambda x: pallas_pair_gram_fused(x, x, ix, iy, h, grad_precision="bf16"), X)
print("max value diff:", float(jnp.max(jnp.abs(v32 - v16))))
(d32,), (d16,) = vjp32(g), vjp16(g)
d32, d16 = np.asarray(d32), np.asarray(d16)
rel = np.linalg.norm(d16 - d32) / np.linalg.norm(d32)
cos = (d16 * d32).sum() / (np.linalg.norm(d16) * np.linalg.norm(d32))
print("grad rel err:", rel, " cosine:", cos)
