import time
import numpy as np
import jax
import jax.numpy as jnp

from sigsvgd_tpu.kernels.pallas_sigkernel import _P, pallas_pair_gram_fused

key = jax.random.PRNGKey(0)
tau = jnp.cumsum(jax.random.normal(key, (1024, 40, 2)) * 0.2, axis=1)
n = tau.shape[0]
iu, ju = jnp.triu_indices(n)
npairs = int(iu.shape[0])
pad = (-npairs) % _P
iu_p = jnp.concatenate([iu, jnp.zeros((pad,), iu.dtype)])
ju_p = jnp.concatenate([ju, jnp.zeros((pad,), ju.dtype)])
npp = npairs + pad
h = 4.0


def timeit(f, x, n_rep=3):
    jax.block_until_ready(f(x))
    ts = []
    for i in range(1, n_rep + 1):
        xi = x + i * 1e-5
        jax.block_until_ready(xi)
        t0 = time.perf_counter()
        jax.block_until_ready(f(xi))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def fb(x, gp):
    k, vjp = jax.vjp(
        lambda y: pallas_pair_gram_fused(y, tau, iu_p, ju_p, h, grad_precision=gp), x)
    (dx,) = vjp(jnp.ones_like(k))
    return k, dx


fb32 = jax.jit(lambda x: fb(x, "fp32"))
fb16 = jax.jit(lambda x: fb(x, "bf16"))

t32 = timeit(fb32, tau)
print(f"fp32 fwd+bwd: {t32*1e3:.1f} ms  ({t32/npp*1e6:.3f} us/pair)")
t16 = timeit(fb16, tau)
print(f"bf16 fwd+bwd: {t16*1e3:.1f} ms  ({t16/npp*1e6:.3f} us/pair)")
print(f"speedup: {t32/t16:.2f}x")

# on-device gradient agreement at the flagship shape
k32, d32 = fb32(tau)
k16, d16 = fb16(tau)
d32 = np.asarray(d32)
d16 = np.asarray(d16)
rel = np.linalg.norm(d16 - d32) / np.linalg.norm(d32)
cos = (d16 * d32).sum() / (np.linalg.norm(d16) * np.linalg.norm(d32))
print("device grad rel err:", rel, " cosine:", cos)
print("value diff:", float(jnp.max(jnp.abs(k32 - k16))))
