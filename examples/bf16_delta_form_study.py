"""Numerics study behind docs/bf16_adjoint_study.md: delta-form Goursat
recurrences vs the fp64 oracle at the flagship MPC shape (39x39 coarse
cells, dyadic 3, RBF statics). Run on CPU:

    JAX_PLATFORMS=cpu python examples/bf16_delta_form_study.py

Small-form coefficients (alpha = a-1 etc.) are computed in high precision
THEN cast to bf16 — never via subtraction of near-1 bf16 values (a naive
bf16 sweep measures ~0.8 relative error at |z| ~ 1e-3, far below bf16's
quantum around 1).

Variants, vs the fp64 oracle:

  fwd:  fp32/fp64 standard | delta-o2 | delta-o1 (first order in z),
        each at fp32 or bf16
  adj:  same
  dz:   full-precision-k hybrid and all-delta combinations
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_enable_x64", True)

lam, lx1, ly1 = 3, 39, 39
M = 1 << lam
gx, gy = lx1 * M, ly1 * M
B = 8

rng = np.random.default_rng(0)
base = np.cumsum(rng.normal(size=(B + 1, 40, 2)) * 0.35, axis=1)
X, Y = base[:B], base[1 : B + 1]
d2 = ((X[:, :, None, :] - Y[:, None, :, :]) ** 2).sum(-1)
g = np.exp(-d2 / 4.0)
inc = g[:, 1:, 1:] - g[:, 1:, :-1] - g[:, :-1, 1:] + g[:, :-1, :-1]
z64 = inc / 4.0**lam


def coef(z):
    return 1 + 0.5 * z + z * z / 12, 1 - z * z / 12


def fine(x):
    return np.repeat(np.repeat(x, M, 1), M, 2)


def fwd_standard(z, dtype):
    a, b = coef(z)
    ar = jnp.asarray(fine(a), dtype)
    br = jnp.asarray(fine(b), dtype)

    def row(k_prev, ab):
        aj, bj = ab

        def cell(c, inp):
            kp_j, kp_jm1, a_, b_ = inp
            k = (c + kp_j) * a_ - kp_jm1 * b_
            return k, k

        _, krow = lax.scan(cell, jnp.ones((B,), dtype),
                           (k_prev[:, 1:].T, k_prev[:, :-1].T, aj.T, bj.T))
        k_new = jnp.concatenate([jnp.ones((B, 1), dtype), krow.T], 1)
        return k_new, k_new

    k0 = jnp.ones((B, gy + 1), dtype)
    _, rows = lax.scan(row, k0, (jnp.moveaxis(ar, 1, 0), jnp.moveaxis(br, 1, 0)))
    return rows


def fwd_delta(z, dtype, order):
    # p[i,j] = k[i,j]-k[i-1,j]:
    #   o2: p = p_r + alpha*p_r + c1*k_SW + c2*k_S
    #   o1: p = p_r + zh*(k_SW + k_S)
    alpha = z / 2 + z * z / 12
    c1 = z / 2 + z * z / 6
    zh = z / 2
    al = jnp.asarray(fine(alpha), dtype)
    c1r = jnp.asarray(fine(c1), dtype)
    zhr = jnp.asarray(fine(zh), dtype)

    def row(k_prev, abc):
        a_, c1_, zh_ = abc

        def cell(p, inp):
            kp_j, kp_jm1, aj, c1j, zhj = inp
            if order == 2:
                p = p + aj * p + c1j * kp_jm1 + aj * kp_j
            else:
                p = p + zhj * (kp_jm1 + kp_j)
            k = kp_j + p
            return p, k

        _, krow = lax.scan(cell, jnp.zeros((B,), dtype),
                           (k_prev[:, 1:].T, k_prev[:, :-1].T, a_.T, c1_.T, zh_.T))
        k_new = jnp.concatenate([jnp.ones((B, 1), dtype), krow.T], 1)
        return k_new, k_new

    k0 = jnp.ones((B, gy + 1), dtype)
    _, rows = lax.scan(row, k0, (jnp.moveaxis(al, 1, 0), jnp.moveaxis(c1r, 1, 0),
                                 jnp.moveaxis(zhr, 1, 0)))
    return rows


def adj_standard(z, dtype):
    a, b = coef(z)
    af = jnp.asarray(fine(a), dtype)
    bf = jnp.asarray(fine(b), dtype)

    def row(g_up, i):
        ci = jnp.clip(i - 1, 0, gx - 1)
        ciu = jnp.clip(i, 0, gx - 1)
        a1 = af[:, ci, :]
        a2 = af[:, ciu, :]
        b3 = bf[:, ciu, :]
        seed = jnp.where(i == gx, jnp.asarray(1.0, dtype), jnp.asarray(0.0, dtype))
        g_gy = a2[:, gy - 1] * g_up[:, gy] + seed

        def cell(g_right, inp):
            gu_j, gu_jp1, a1j, a2j, b3j = inp
            gn = a1j * g_right + a2j * gu_j - b3j * gu_jp1
            return gn, gn

        js = jnp.arange(gy - 1, 0, -1)
        _, grow = lax.scan(cell, g_gy,
                           (g_up[:, js].T, g_up[:, js + 1].T,
                            a1[:, js].T, a2[:, js - 1].T, b3[:, js].T))
        g_new = jnp.concatenate(
            [jnp.zeros((B, 1), dtype), grow[::-1].T, g_gy[:, None]], 1)
        return g_new, g_new

    g0 = jnp.zeros((B, gy + 1), dtype)
    _, rows = lax.scan(row, g0, jnp.arange(gx, 0, -1))
    return rows


def adj_delta(z, dtype, order):
    # rho[i,j] = ghat[i,j]-ghat[i+1,j]:
    #   o2: rho = rho_r + a1m*rho_r + c13*g_dr + a2m*g_u
    #       (a1m = a1-1, c13 = a1-b3, a2m = a2-1; small-form, fp64 -> cast)
    #   o1: rho = rho_r + zh1*g_dr + zh2*g_u
    a, b = coef(z)
    a1m = jnp.asarray(fine(a - 1), dtype)
    c13f = np.empty_like(fine(a))
    afm = fine(a)
    bfm = fine(b)
    zhf = jnp.asarray(fine(z / 2), dtype)
    af64 = fine(a)
    bf64 = fine(b)

    def row(g_up, i):
        ci = jnp.clip(i - 1, 0, gx - 1)
        ciu = jnp.clip(i, 0, gx - 1)
        if order == 2:
            a1m_r = a1m[:, ci, :]
            # c13 = a1 - b3 computed fp64 then cast
            c13 = jnp.asarray(af64, jnp.float64)[:, ci, :] - jnp.asarray(
                bf64, jnp.float64)[:, ciu, :]
            c13 = c13.astype(dtype)
            a2m_r = a1m[:, ciu, :]
        else:
            zh1 = zhf[:, ci, :]
            zh2 = zhf[:, ciu, :]
        seed = jnp.where(i == gx, jnp.asarray(1.0, dtype), jnp.asarray(0.0, dtype))
        if order == 2:
            rho_gy = a1m[:, ciu, gy - 1] * g_up[:, gy] + seed
        else:
            rho_gy = zhf[:, ciu, gy - 1] * g_up[:, gy] + seed
        g_gy = g_up[:, gy] + rho_gy

        def cell(rho_right, inp):
            if order == 2:
                gu_j, gu_jp1, a1mj, c13j, a2mj = inp
                rho = rho_right + a1mj * rho_right + c13j * gu_jp1 + a2mj * gu_j
            else:
                gu_j, gu_jp1, zh1j, zh2j = inp
                rho = rho_right + zh1j * gu_jp1 + zh2j * gu_j
            gn = gu_j + rho
            return rho, gn

        js = jnp.arange(gy - 1, 0, -1)
        if order == 2:
            xs = (g_up[:, js].T, g_up[:, js + 1].T,
                  a1m_r[:, js].T, c13[:, js].T, a2m_r[:, js - 1].T)
        else:
            xs = (g_up[:, js].T, g_up[:, js + 1].T, zh1[:, js].T, zh2[:, js - 1].T)
        _, grow = lax.scan(cell, rho_gy, xs)
        g_new = jnp.concatenate(
            [jnp.zeros((B, 1), dtype), grow[::-1].T, g_gy[:, None]], 1)
        return g_new, g_new

    g0 = jnp.zeros((B, gy + 1), dtype)
    _, rows = lax.scan(row, g0, jnp.arange(gx, 0, -1))
    return rows


def kfield(rows):
    k = np.ones((B, gx + 1, gy + 1))
    k[:, 1:, :] = np.moveaxis(np.asarray(rows, np.float64), 0, 1)
    return k


def gfield(rows):
    gh = np.zeros((B, gx + 2, gy + 2))
    gh[:, gx:0:-1, : gy + 1] = np.swapaxes(np.asarray(rows, np.float64), 0, 1)
    return gh


def dz_from(k, gh, z):
    ap = 0.5 + fine(z) / 6.0
    bp = -fine(z) / 6.0
    lamf = gh[:, 1 : gx + 1, 1 : gy + 1]
    kw, ks, ksw = k[:, 1:, :-1], k[:, :-1, 1:], k[:, :-1, :-1]
    f = lamf * ((kw + ks) * ap - ksw * bp)
    return f.reshape(B, lx1, M, ly1, M).sum((2, 4))


def relerr(x, ref):
    return np.linalg.norm(x - ref) / np.linalg.norm(ref)


k64 = kfield(fwd_standard(z64, jnp.float64))
g64 = gfield(adj_standard(z64, jnp.float64))
dz64 = dz_from(k64, g64, z64)

k32 = kfield(fwd_standard(z64, jnp.float32))
g32 = gfield(adj_standard(z64, jnp.float32))
print("fp32 std  : k", f"{relerr(k32[:, -1, -1], k64[:, -1, -1]):.2e}",
      " ghat", f"{relerr(g32, g64):.2e}",
      " dz", f"{relerr(dz_from(k32, g32, z64), dz64):.2e}")

for dtype, dname in ((jnp.bfloat16, "bf16"), (jnp.float32, "fp32")):
    for order in (2, 1):
        kd = kfield(fwd_delta(z64, dtype, order))
        gd = gfield(adj_delta(z64, dtype, order))
        tag = f"{dname} d-o{order}"
        print(f"{tag}: k corner", f"{relerr(kd[:, -1, -1], k64[:, -1, -1]):.2e}",
              " ghat", f"{relerr(gd, g64):.2e}",
              " dz(all-delta)", f"{relerr(dz_from(kd, gd, z64), dz64):.2e}",
              " dz(hybrid fp32-k)", f"{relerr(dz_from(k32, gd, z64), dz64):.2e}")
