"""Parity tests for the Pallas MXU hop-chain PDE solver.

``solve_goursat_pde_mxu_pallas`` is a bf16-MXU ("default"-grade) drop-in for
the XLA block-propagator; these tests pin the XLA ``precision='highest'``
path as the oracle and check values AND custom-VJP gradients at the bf16
tolerance. On CPU (the test platform) the kernel runs in Pallas interpret
mode — the exact code the TPU compiles; a ``tpu``-marked subprocess test
covers compiled mode on the real chip.

Reference semantics: sigkernel's Goursat PDE Gram
(``/root/reference/src/kernels/_traj_kernels.py:198-206``).
"""
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigsvgd_tpu.kernels.pallas_mxu_chain import (
    chain_supported,
    solve_goursat_pde_mxu_pallas,
)
from sigsvgd_tpu.kernels.sigkernel import SignatureKernel, solve_goursat_pde_mxu


@pytest.mark.parametrize(
    "lx1,ly1,lam,b",
    [
        (2, 2, 6, 3),     # 4 hops, pairs pad 3 -> 128 lanes
        # heavier shapes in the slow lane (interpret-mode hop chains are
        # ~20 s each on CPU; the 4-hop case keeps fast-lane coverage)
        pytest.param(4, 4, 6, 5, marks=pytest.mark.slow),  # flagship planning
        pytest.param(2, 2, 7, 2, marks=pytest.mark.slow),  # sub=2 -> 16 hops
    ],
)
def test_chain_matches_xla_highest(rng, lx1, ly1, lam, b):
    """Values + VJP vs solve_goursat_pde_mxu(precision='highest') at bf16
    tolerance (mirrors test_mxu_block_propagator_matches_wavefront)."""
    assert chain_supported(lx1, ly1, lam)
    inc = jnp.asarray(
        np.clip(rng.standard_normal((b, lx1, ly1)), -2, 2).astype(np.float32)
    )
    g = jnp.asarray(rng.standard_normal(b).astype(np.float32))

    k_ref, vjp_ref = jax.vjp(
        lambda z: solve_goursat_pde_mxu(z, lam, degree=10, precision="highest"),
        inc,
    )
    k_pl, vjp_pl = jax.vjp(
        lambda z: solve_goursat_pde_mxu_pallas(z, lam, degree=10), inc
    )
    # bf16 MXU inputs with fp32 accumulation: ~2e-3 error relative to the
    # magnitude of the SOLVE (kernel values span orders of magnitude within
    # a batch, so the comparison is normalized by the batch max, like the
    # gradient check below)
    scale_k = np.abs(np.asarray(k_ref)).max()
    np.testing.assert_allclose(
        np.asarray(k_pl) / scale_k, np.asarray(k_ref) / scale_k, atol=5e-3
    )
    (d_ref,) = vjp_ref(g)
    (d_pl,) = vjp_pl(g)
    scale = np.abs(np.asarray(d_ref)).max()
    np.testing.assert_allclose(
        np.asarray(d_pl) / scale, np.asarray(d_ref) / scale, atol=1e-2
    )


def test_chain_rejects_unsupported_shapes(rng):
    inc = jnp.ones((2, 4, 4), jnp.float32)
    with pytest.raises(ValueError, match="dyadic_order"):
        solve_goursat_pde_mxu_pallas(inc, 3)  # dyadic < 6
    with pytest.raises(ValueError, match="block hops"):
        solve_goursat_pde_mxu_pallas(jnp.ones((2, 8, 8), jnp.float32), 6)


def test_solver_dispatch_pins_explicit_choices():
    """Explicit solver='mxu' must NEVER reroute to the Pallas chain (it is
    the matched-precision escape hatch); explicit 'mxu_pallas' on an
    unsupported shape falls back to 'mxu' instead of crashing."""
    k = SignatureKernel(dyadic_order=6, bandwidth=1.5, solver="mxu",
                        mxu_precision="default")
    assert k._solver_kind(4, 4) == "mxu"
    k2 = SignatureKernel(dyadic_order=6, bandwidth=1.5, solver="mxu_pallas")
    assert k2._solver_kind(4, 4) == "mxu_pallas"
    assert k2._solver_kind(8, 8) == "mxu"     # 64 hops > 16 cap
    k3 = SignatureKernel(dyadic_order=3, bandwidth=1.5, solver="mxu_pallas")
    assert k3._solver_kind(4, 4) == "mxu"     # dyadic < 6


_TPU_SNIPPET = r"""
import jax, numpy as np, jax.numpy as jnp
if jax.default_backend() not in ("tpu", "axon"):
    print("NO_TPU"); raise SystemExit(0)
from sigsvgd_tpu.kernels.pallas_mxu_chain import solve_goursat_pde_mxu_pallas
from sigsvgd_tpu.kernels.sigkernel import solve_goursat_pde_mxu
rng = np.random.default_rng(0)
inc = jnp.asarray(np.clip(rng.standard_normal((5, 4, 4)), -2, 2).astype(np.float32))
g = jnp.asarray(rng.standard_normal(5).astype(np.float32))
k_ref, vjp_ref = jax.vjp(lambda z: solve_goursat_pde_mxu(z, 6, degree=10, precision="highest"), inc)
k_pl, vjp_pl = jax.vjp(lambda z: solve_goursat_pde_mxu_pallas(z, 6, degree=10), inc)
sk = np.abs(np.asarray(k_ref)).max()
np.testing.assert_allclose(np.asarray(k_pl) / sk, np.asarray(k_ref) / sk, atol=5e-3)
(d_ref,), (d_pl,) = vjp_ref(g), vjp_pl(g)
s = np.abs(np.asarray(d_ref)).max()
np.testing.assert_allclose(np.asarray(d_pl) / s, np.asarray(d_ref) / s, atol=1e-2)
print("TPU_OK")
"""


@pytest.mark.tpu
@pytest.mark.slow
def test_chain_compiled_mode_on_tpu():
    """Compiled-mode parity on the real chip. The in-process suite is pinned
    to the virtual CPU platform, so this runs a fresh interpreter with the
    container's default (TPU tunnel) platform."""
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, "-c", _TPU_SNIPPET],
        capture_output=True, text=True, timeout=1200, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    if "NO_TPU" in out.stdout:
        pytest.skip("no TPU backend available")
    assert "TPU_OK" in out.stdout, out.stdout + out.stderr
