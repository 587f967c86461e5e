"""Numerics simulation: can a delta-form bf16 Goursat recurrence deliver
SVGD-grade gradients? Compares, at the flagship MPC shape (39x39 coarse,
dyadic 3, G=312), against an fp64 oracle:

  - fp32 standard scheme            (current kernel)
  - bf16 standard scheme            (prior session measured ~1x value error)
  - bf16 DELTA scheme: carry the small inter-row difference p = k[i]-k[i-1]
    in bf16 (no cancellation: all terms O(z*k)), rebuild k by one add.

For values (forward), the adjoint field, and the coarse-cell dz gradient.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

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
z64 = inc / 4.0**lam  # [B, 39, 39]
print("z range:", z64.min(), z64.max())


def coef(z):
    return 1 + 0.5 * z + z * z / 12, 1 - z * z / 12


def fwd_standard(z, dtype):
    z = jnp.asarray(z, dtype)
    a, b = coef(z)
    a_rows = jnp.repeat(jnp.repeat(a, M, 1), M, 2)  # [B, gx, gy] per fine cell
    b_rows = jnp.repeat(jnp.repeat(b, M, 1), M, 2)

    def row(k_prev, ab):
        ar, br = ab  # [B, gy]

        def cell(c, inp):
            kp_j, kp_jm1, aj, bj = inp  # k[i-1,j], k[i-1,j-1]
            k = (c + kp_j) * aj - kp_jm1 * bj
            return k, k

        _, krow = lax.scan(
            cell,
            jnp.ones((z.shape[0],), dtype),
            (k_prev[:, 1:].T, k_prev[:, :-1].T, ar.T, br.T),
        )
        k_new = jnp.concatenate([jnp.ones((z.shape[0], 1), dtype), krow.T], 1)
        return k_new, k_new

    k0 = jnp.ones((z.shape[0], gy + 1), dtype)
    _, rows = lax.scan(row, k0, (jnp.moveaxis(a_rows, 1, 0), jnp.moveaxis(b_rows, 1, 0)))
    return rows  # [gx, B, gy+1]


def fwd_delta(z, dtype):
    z = jnp.asarray(z, dtype)
    a, b = coef(z)
    c1 = a - b  # z/2 + z^2/6  (small)
    c2 = a - jnp.asarray(1.0, dtype)  # z/2 + z^2/12 (small)
    a_rows = jnp.repeat(jnp.repeat(a, M, 1), M, 2)
    c1_rows = jnp.repeat(jnp.repeat(c1, M, 1), M, 2)
    c2_rows = jnp.repeat(jnp.repeat(c2, M, 1), M, 2)

    def row(k_prev, abc):
        ar, c1r, c2r = abc

        def cell(p, inp):
            kp_j, kp_jm1, aj, c1j, c2j = inp
            p = aj * p + c1j * kp_jm1 + c2j * kp_j
            k = kp_j + p
            return p, k

        _, krow = lax.scan(
            cell,
            jnp.zeros((z.shape[0],), dtype),
            (k_prev[:, 1:].T, k_prev[:, :-1].T, ar.T, c1r.T, c2r.T),
        )
        k_new = jnp.concatenate([jnp.ones((z.shape[0], 1), dtype), krow.T], 1)
        return k_new, k_new

    k0 = jnp.ones((z.shape[0], gy + 1), dtype)
    _, rows = lax.scan(
        row, k0,
        (jnp.moveaxis(a_rows, 1, 0), jnp.moveaxis(c1_rows, 1, 0),
         jnp.moveaxis(c2_rows, 1, 0)),
    )
    return rows


def adj_standard(z, dtype):
    """Adjoint field for seed at (gx, gy). ghat[i, j] over the full grid,
    computed rows top-down; returns [gx, B, gy+1] rows i=1..gx (row index
    r -> i = r+1) like fwd returns."""
    z = jnp.asarray(z, dtype)
    a, b = coef(z)
    # per-node coefficient fields a1(i,j)=a_cell(i-1,j), a2=a_cell(i,j-1),
    # b3=b_cell(i,j), clamped at boundaries (the out-of-range ghat are 0)
    af = jnp.repeat(jnp.repeat(a, M, 1), M, 2)  # [B, gx, gy] cell field
    bf = jnp.repeat(jnp.repeat(b, M, 1), M, 2)

    def a_cell(ii, jj):  # fine-cell coefficient with clamping, ii,jj arrays
        ii = jnp.clip(ii, 0, gx - 1)
        jj = jnp.clip(jj, 0, gy - 1)
        return af[:, ii, :][:, :, jj] if False else None

    # simpler: loop rows in python is too slow; build per-row coefficient
    # gathers inside scan over i (descending)
    def row(g_up, idx):
        i = idx  # current row i (gx down to 1... we'll do gx..0)
        ci = jnp.clip(i - 1, 0, gx - 1)
        ciu = jnp.clip(i, 0, gx - 1)
        a1 = af[:, ci, :]  # [B, gy] cell (i-1, j) for j=0..gy-1
        a2 = af[:, ciu, :]  # cell (i, j-1) -> use column j-1 when scanning
        b3 = bf[:, ciu, :]  # cell (i, j)
        # scan j from gy down to 1; node gy handled first as carry seed
        # ghat[i, gy] = a2[:, gy-1] * g_up[:, gy] + seed(i==gx)
        seed = jnp.where(i == gx, jnp.asarray(1.0, dtype), jnp.asarray(0.0, dtype))
        g_gy = a2[:, gy - 1] * g_up[:, gy] + seed

        def cell(g_right, inp):
            gu_j, gu_jp1, a1j, a2j, b3j = inp
            gn = a1j * g_right + a2j * gu_j - b3j * gu_jp1
            return gn, gn

        js = jnp.arange(gy - 1, 0, -1)
        _, grow = lax.scan(
            cell,
            g_gy,
            (g_up[:, js].T, g_up[:, js + 1].T,
             a1[:, js].T, a2[:, js - 1].T, b3[:, js].T),
        )
        g_new = jnp.concatenate(
            [jnp.zeros((z64.shape[0], 1), dtype), grow[::-1].T,
             g_gy[:, None]], 1)
        return g_new, g_new

    g_init = jnp.zeros((z.shape[0], gy + 1), dtype)
    _, rows = lax.scan(row, g_init, jnp.arange(gx, 0, -1))
    return rows  # rows r -> i = gx - r


def adj_delta(z, dtype):
    z = jnp.asarray(z, dtype)
    a, b = coef(z)
    af = jnp.repeat(jnp.repeat(a, M, 1), M, 2)
    bf = jnp.repeat(jnp.repeat(b, M, 1), M, 2)
    one = jnp.asarray(1.0, dtype)

    def row(g_up, idx):
        i = idx
        ci = jnp.clip(i - 1, 0, gx - 1)
        ciu = jnp.clip(i, 0, gx - 1)
        a1 = af[:, ci, :]
        a2 = af[:, ciu, :]
        b3 = bf[:, ciu, :]
        seed = jnp.where(i == gx, one, jnp.asarray(0.0, dtype))
        # node gy: rho = ghat[i,gy] - ghat[i+1,gy] = a2*g_up[gy] + seed - g_up[gy]
        rho_gy = (a2[:, gy - 1] - one) * g_up[:, gy] + seed
        g_gy = g_up[:, gy] + rho_gy

        def cell(carry, inp):
            rho_right = carry
            gu_j, gu_jp1, a1j, a2j, b3j = inp
            rho = a1j * rho_right + (a1j - b3j) * gu_jp1 + (a2j - one) * gu_j
            gn = gu_j + rho
            return rho, gn

        js = jnp.arange(gy - 1, 0, -1)
        _, grow = lax.scan(
            cell,
            rho_gy,
            (g_up[:, js].T, g_up[:, js + 1].T,
             a1[:, js].T, a2[:, js - 1].T, b3[:, js].T),
        )
        g_new = jnp.concatenate(
            [jnp.zeros((z64.shape[0], 1), dtype), grow[::-1].T,
             g_gy[:, None]], 1)
        return g_new, g_new

    g_init = jnp.zeros((z.shape[0], gy + 1), dtype)
    _, rows = lax.scan(row, g_init, jnp.arange(gx, 0, -1))
    return rows


def full_field_from_rows(rows, kind):
    # rows: fwd -> [gx, B, gy+1] for i=1..gx; adj -> i=gx..1
    if kind == "fwd":
        k = np.ones((B, gx + 1, gy + 1))
        k[:, 1:, :] = np.moveaxis(np.asarray(rows, np.float64), 0, 1)
    else:
        k = np.zeros((B, gx + 2, gy + 2))  # ghat with zero pad at gx+1
        k[:, gx:0:-1, : gy + 1] = np.swapaxes(
            np.asarray(rows, np.float64), 0, 1
        )[:, :, :]
        # ghat[0, :] never used for dz (cells need i>=1)
    return k


def dz_from_fields(k, ghat, z):
    # dz per fine cell -> coarse sum. cell (I, J) fine, NE node (I+1, J+1)
    ap = 0.5 + np.repeat(np.repeat(z, M, 1), M, 2) / 6.0
    bp = -np.repeat(np.repeat(z, M, 1), M, 2) / 6.0
    lamf = ghat[:, 1 : gx + 1, 1 : gy + 1]  # ghat at NE nodes
    kw = k[:, 1:, :-1]  # k[i, j-1]
    ks = k[:, :-1, 1:]  # k[i-1, j]
    ksw = k[:, :-1, :-1]
    fine = lamf * ((kw + ks) * ap - ksw * bp)
    return fine.reshape(B, lx1, M, ly1, M).sum((2, 4))


def relerr(x, ref):
    return np.linalg.norm(x - ref) / np.linalg.norm(ref)


k64 = full_field_from_rows(fwd_standard(z64, jnp.float64), "fwd")
g64 = full_field_from_rows(adj_standard(z64, jnp.float64), "adj")
dz64 = dz_from_fields(k64, g64, z64)
print("corner k (fp64):", k64[:, -1, -1])

for name, fwd_fn, adj_fn, dt in [
    ("fp32 standard", fwd_standard, adj_standard, jnp.float32),
    ("bf16 standard", fwd_standard, adj_standard, jnp.bfloat16),
    ("bf16 delta   ", fwd_delta, adj_delta, jnp.bfloat16),
]:
    k = full_field_from_rows(fwd_fn(z64, dt), "fwd")
    gh = full_field_from_rows(adj_fn(z64, dt), "adj")
    dz = dz_from_fields(k, gh, z64)
    print(
        f"{name}: corner-value relerr {relerr(k[:, -1, -1], k64[:, -1, -1]):.2e}"
        f"  ghat relerr {relerr(gh, g64):.2e}  dz relerr {relerr(dz, dz64):.2e}"
    )
