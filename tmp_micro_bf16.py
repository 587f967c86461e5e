"""Micro: are elementwise bf16 ops packed (2 values/lane) on this TPU via
Mosaic? Chain of FMAs on [16,128] bf16 (4KB = 1 vreg if packed) vs [8,128]
fp32 (1 vreg), same logical element count per program would be 2x for bf16."""
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_ITER = 2048


def kern(x_ref, o_ref):
    a = x_ref[...]
    b = a * 1.0009765625 + a  # constants exactly representable
    c = a
    for _ in range(N_ITER):
        c = c * 0.999 + b
    o_ref[...] = c


def run(shape, dtype, tiles=512):
    x = jnp.ones((tiles, *shape), dtype)
    f = pl.pallas_call(
        kern,
        grid=(tiles,),
        in_specs=[pl.BlockSpec((1, *shape), lambda p: (p, 0, 0))],
        out_specs=pl.BlockSpec((1, *shape), lambda p: (p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((tiles, *shape), dtype),
    )
    fj = jax.jit(f)
    jax.block_until_ready(fj(x))
    t0 = time.perf_counter()
    jax.block_until_ready(fj(x + 1e-3))
    dt = time.perf_counter() - t0
    elems = tiles * shape[0] * shape[1] * N_ITER
    print(f"{dtype.__name__} {shape}: {dt*1e3:.1f} ms, "
          f"{elems/dt/1e12:.3f} Telem-FMA/s")
    return dt


d32 = run((8, 128), jnp.float32)
d16 = run((16, 128), jnp.bfloat16)
print("per-element speedup bf16/fp32:", (d32 * 2) / d16)
d16b = run((8, 128), jnp.bfloat16)
print("bf16 (8,128) vs fp32 (8,128):", d32 / d16b)
