import time
import jax
import jax.numpy as jnp

from sigsvgd_tpu.kernels import SignatureKernel
from sigsvgd_tpu.kernels.pallas_sigkernel import (
    pallas_pair_gram_fused, _solve_tiled,
)

key = jax.random.PRNGKey(0)
tau = jax.random.normal(key, (1024, 40, 2)) * 0.5
sig = SignatureKernel(dyadic_order=3, bandwidth=4.0)
n = tau.shape[0]
iu, ju = jnp.triu_indices(n)
npairs = int(iu.shape[0])
pad = (-npairs) % 2048
iu_p = jnp.concatenate([iu, jnp.zeros((pad,), iu.dtype)])
ju_p = jnp.concatenate([ju, jnp.zeros((pad,), ju.dtype)])
npairs_p = npairs + pad
print("pairs:", npairs, "padded:", npairs_p)


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


h = 4.0

g_and_g = jax.jit(lambda x: sig.gram_and_grad(x))
t_gg = timeit(g_and_g, tau)
print(f"gram_and_grad: {t_gg*1e3:.1f} ms  ({t_gg/npairs*1e6:.3f} us/pair)")

fwd_only = jax.jit(lambda x: pallas_pair_gram_fused(x, x, iu_p, ju_p, h))
t_f = timeit(fwd_only, tau)
print(f"fused fwd values: {t_f*1e3:.1f} ms  ({t_f/npairs_p*1e6:.3f} us/pair)")


def fb(x):
    k, vjp = jax.vjp(lambda y: pallas_pair_gram_fused(y, tau, iu_p, ju_p, h), x)
    (dx,) = vjp(jnp.ones_like(k))
    return k, dx


fb_j = jax.jit(fb)
t_fb = timeit(fb_j, tau)
print(f"fused fwd+bwd: {t_fb*1e3:.1f} ms  ({t_fb/npairs_p*1e6:.3f} us/pair)")
print(f"implied bwd: {(t_fb-t_f)/npairs_p*1e6:.3f} us/pair")

inc0 = jax.random.normal(jax.random.PRNGKey(1), (npairs_p, 39, 39)) * 0.02
raw = jax.jit(_solve_tiled)
t_raw = timeit(raw, inc0)
print(f"raw tiled fwd: {t_raw*1e3:.1f} ms  ({t_raw/npairs_p*1e6:.3f} us/pair)")


def raw_fb(z):
    k, vjp = jax.vjp(_solve_tiled, z)
    (dz,) = vjp(jnp.ones_like(k))
    return k, dz


raw_fb_j = jax.jit(raw_fb)
t_rfb = timeit(raw_fb_j, inc0)
print(f"raw tiled fwd+bwd: {t_rfb*1e3:.1f} ms  ({t_rfb/npairs_p*1e6:.3f} us/pair)")
