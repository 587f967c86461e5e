"""Numeric parity against the ACTUAL reference implementation.

The reference (`/root/reference`, lubaroli/sigsvgd, torch) is importable in
this image once `signatory`/`sigkernel`/`gpytorch` are stubbed in
``sys.modules`` (none of the components tested here touch those imports at
call time).  Every test below runs the same fixed inputs through the torch
reference and the TPU-native build and asserts numeric agreement — or, for
the intentional deviations documented in the docstrings (IMQ gradient sign,
UTF Cholesky convention, MPF phi sign, cartpole total-mass expression),
asserts the *expected difference* against the reference's actual output.

Tolerances: reference runs in torch fp32 (CPU); ours in jax fp32 (CPU).
Matmul association differs, so agreement is asserted at ~1e-5 relative.
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


# ---------------------------------------------------------------------------
# Reference import plumbing
# ---------------------------------------------------------------------------

def _install_stubs():
    """Stub the reference's unavailable native deps (signatory/sigkernel/
    gpytorch). The stubs are import-time only; no stubbed symbol is exercised
    by the components under test."""
    if "signatory" not in sys.modules:
        sig = types.ModuleType("signatory")
        sig.signature = None
        sys.modules["signatory"] = sig
    if "sigkernel" not in sys.modules:
        sk = types.ModuleType("sigkernel")

        class _Unavailable:
            def __init__(self, *a, **k):
                raise RuntimeError("sigkernel stub")

        sk.SigKernel = _Unavailable
        sk.RBFKernel = _Unavailable
        sys.modules["sigkernel"] = sk
    if "gpytorch" not in sys.modules:
        gp = types.ModuleType("gpytorch")
        priors = types.ModuleType("gpytorch.priors")

        class SmoothedBoxPrior:
            def __init__(self, a, b, sigma=0.01, **k):
                self.a, self.b, self.sigma = a, b, sigma

            def log_prob(self, x):
                # Gaussian-smoothed box log-density (gpytorch's closed form)
                a = torch.as_tensor(self.a, dtype=x.dtype)
                b = torch.as_tensor(self.b, dtype=x.dtype)
                sigma = torch.as_tensor(self.sigma, dtype=x.dtype)
                center = (a + b) / 2
                half = (b - a) / 2
                out = torch.clamp(x.sub(center).abs() - half, min=0.0)
                log_z = torch.log(2 * half + np.sqrt(2 * np.pi) * sigma)
                return (-0.5 * (out / sigma) ** 2 - log_z).sum(-1)

        priors.SmoothedBoxPrior = SmoothedBoxPrior
        gp.priors = priors
        sys.modules["gpytorch"] = gp
        sys.modules["gpytorch.priors"] = priors


@pytest.fixture(scope="module")
def ref():
    """Namespace of imported reference modules."""
    import os

    if not os.path.isdir("/root/reference/src"):
        pytest.skip("torch reference checkout not available")
    _install_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import src.utils.math as rmath
    import src.utils.scheduler as rsched
    import src.utils.utf as rutf
    import src.utils.obstacle_map as rom
    import src.kernels._kernels as rkern
    import src.models.particle as rparticle
    import src.models.pendulum as rpend
    import src.models.cartpole as rcart
    import src.models.skid_steer_robot as rskid
    import src.inference.svgd as rsvgd
    import src.inference.likelihoods as rlik

    ns = types.SimpleNamespace(
        math=rmath, sched=rsched, utf=rutf, om=rom, kern=rkern,
        particle=rparticle, pend=rpend, cart=rcart, skid=rskid,
        svgd=rsvgd, lik=rlik,
    )
    return ns


def t(x):
    # always COPY: the reference mutates tensors in-place (e.g. SVGD.optimize
    # writes `particles[:] = X`, svgd.py:156) and a shared-memory view would
    # corrupt the numpy input the jax side reads afterwards
    return torch.tensor(np.asarray(x), dtype=torch.float32)


def n(x):
    if isinstance(x, torch.Tensor):
        return x.detach().cpu().numpy()
    return np.asarray(x)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    X = rng.normal(size=(12, 5)).astype(np.float32)
    Y = rng.normal(size=(12, 5)).astype(np.float32)
    A = rng.normal(size=(5, 5)).astype(np.float32)
    M = (A @ A.T + 0.5 * np.eye(5)).astype(np.float32)  # PSD metric
    return types.SimpleNamespace(rng=rng, X=X, Y=Y, M=M)


# ---------------------------------------------------------------------------
# §1 math utils  (reference src/utils/math.py:28-166)
# ---------------------------------------------------------------------------

def test_pw_dist_sq_parity(ref, data):
    from sigsvgd_tpu.utils.math import pw_dist_sq

    got = np.asarray(pw_dist_sq(jnp.asarray(data.X), jnp.asarray(data.Y)))
    want = n(ref.math.pw_dist_sq(t(data.X), t(data.Y)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_scaled_pw_dist_sq_parity(ref, data):
    from sigsvgd_tpu.utils.math import scaled_pw_dist_sq

    d2, dgrad = scaled_pw_dist_sq(
        jnp.asarray(data.X), jnp.asarray(data.Y), jnp.asarray(data.M),
        return_gradient=True,
    )
    want_d2, want_grad = ref.math.scaled_pw_dist_sq(
        t(data.X), t(data.Y), t(data.M), return_gradient=True
    )
    np.testing.assert_allclose(np.asarray(d2), n(want_d2), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dgrad), n(want_grad), rtol=1e-4, atol=1e-5)


def test_bw_median_parity(ref, data):
    from sigsvgd_tpu.utils.math import bw_median, pw_dist_sq

    d2 = pw_dist_sq(jnp.asarray(data.X), jnp.asarray(data.X))
    got = float(bw_median(d2, bw_scale=1.3))
    want = float(ref.math.bw_median(ref.math.pw_dist_sq(t(data.X), t(data.X)), 1.3))
    assert got == pytest.approx(want, rel=1e-5)


def test_bw_silverman_parity(ref, data):
    from sigsvgd_tpu.utils.math import bw_silverman

    # reference computes over axis 0 of the (flattened) particle matrix
    got = np.asarray(bw_silverman(jnp.asarray(data.X), bw_scale=1.1))
    want = n(ref.math.bw_silverman(t(data.X), 1.1))
    np.testing.assert_allclose(got, np.broadcast_to(want, got.shape), rtol=1e-4)


def test_gmm_grad_parity(ref, data):
    """Analytic GMM prior gradient vs reference grad_gmm_log_p (the math the
    C++ fast_gmm_diff module implements; reference src/utils/math.py:147-166).

    The GMM is built the way MPF.update_prior does (mpf.py:26-38, Independent
    with reinterpreted_batch_ndims=0) — the reference's own `to_gmm` wraps
    with ndims=1, which torch 2.x MixtureSameFamily rejects outright."""
    import torch.distributions as tdist

    from sigsvgd_tpu.utils.math import grad_gmm_log_p

    rng = np.random.default_rng(3)
    means = rng.normal(size=(6, 4)).astype(np.float32)
    samples = rng.normal(size=(9, 4)).astype(np.float32)
    weights = rng.uniform(0.5, 2.0, size=6).astype(np.float32)
    var = 0.7

    mix = tdist.Categorical(t(weights))
    comp = tdist.Independent(
        tdist.MultivariateNormal(t(means), var * torch.eye(4)), 0
    )
    p = tdist.MixtureSameFamily(mix, comp)
    want = n(ref.math.grad_gmm_log_p(p, t(samples)))
    got = np.asarray(
        grad_gmm_log_p(jnp.asarray(samples), jnp.asarray(means), var,
                       jnp.asarray(weights))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_smoothed_box_prior_parity(ref):
    """Our smoothed-box log-prob vs the gpytorch closed form (stub reproduces
    gpytorch's published density; reference uses it at dust.py:124-130)."""
    from sigsvgd_tpu.utils.math import smoothed_box_log_prob

    x = np.linspace(-3, 3, 17).reshape(-1, 1).astype(np.float32)
    prior = sys.modules["gpytorch.priors"].SmoothedBoxPrior(-1.0, 2.0, sigma=0.2)
    want = n(prior.log_prob(t(x)))
    got = np.asarray(smoothed_box_log_prob(jnp.asarray(x), -1.0, 2.0, sigma=0.2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# §2 kernels  (reference src/kernels/_kernels.py:64-299)
# ---------------------------------------------------------------------------

def _ref_kernel(ref, name):
    return getattr(ref.kern, name)()


@pytest.mark.parametrize("fixed_h", [None, 0.8])
def test_gaussian_kernel_parity(ref, data, fixed_h):
    from sigsvgd_tpu.kernels.rbf import GaussianKernel

    K, dK = GaussianKernel()(jnp.asarray(data.X), jnp.asarray(data.Y), h=fixed_h)
    wK, wdK = _ref_kernel(ref, "GaussianKernel")(t(data.X), t(data.Y), h=fixed_h)
    np.testing.assert_allclose(np.asarray(K), n(wK), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dK), n(wdK), rtol=1e-4, atol=2e-4)


def test_scaled_gaussian_kernel_parity(ref, data):
    from sigsvgd_tpu.kernels.rbf import ScaledGaussianKernel

    K, dK = ScaledGaussianKernel()(
        jnp.asarray(data.X), jnp.asarray(data.Y), M=jnp.asarray(data.M)
    )
    wK, wdK = _ref_kernel(ref, "ScaledGaussianKernel")(
        t(data.X), t(data.Y), M=t(data.M)
    )
    np.testing.assert_allclose(np.asarray(K), n(wK), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dK), n(wdK), rtol=1e-4, atol=2e-4)


def test_imq_kernel_parity_and_expected_sign_deviation(ref, data):
    """IMQ K matches; our gradient is the true ∂k/∂X = MINUS the reference's
    (reference `_kernels.py:236` differentiates w.r.t. Y — documented
    deviation, kernels/rbf.py docstring)."""
    from sigsvgd_tpu.kernels.rbf import IMQKernel

    K, dK = IMQKernel()(jnp.asarray(data.X), jnp.asarray(data.Y), h=1.2)
    wK, wdK = _ref_kernel(ref, "IMQKernel")(t(data.X), t(data.Y), h=1.2)
    np.testing.assert_allclose(np.asarray(K), n(wK), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dK), -n(wdK), rtol=1e-4, atol=2e-4)


def test_scaled_imq_kernel_parity(ref, data):
    """Unlike plain IMQ, the reference's ScaledIMQ gradient has the correct
    sign (diff @ M with diff = X - Y, `_kernels.py:291`): ours matches it
    directly. A symmetric M is passed since the reference skips the
    symmetrization our implementation applies."""
    from sigsvgd_tpu.kernels.rbf import ScaledIMQKernel

    K, dK = ScaledIMQKernel()(
        jnp.asarray(data.X), jnp.asarray(data.Y), M=jnp.asarray(data.M), h=1.2
    )
    wK, wdK = _ref_kernel(ref, "ScaledIMQKernel")(
        t(data.X), t(data.Y), M=t(data.M), h=1.2
    )
    np.testing.assert_allclose(np.asarray(K), n(wK), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dK), n(wdK), rtol=1e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# §3 model steps  (reference src/models/{particle,pendulum,cartpole,skid}*.py)
# ---------------------------------------------------------------------------

def test_particle_step_velocity_parity(ref):
    from sigsvgd_tpu.models.particle import ParticleModel

    rng = np.random.default_rng(11)
    states = rng.normal(size=(8, 2)).astype(np.float32)
    actions = rng.normal(scale=2.0, size=(8, 2)).astype(np.float32)

    rmodel = ref.particle.ParticleModel(
        control_type="velocity", deterministic=True, max_speed=1.5,
        init_state=[0.0, 0.0], map_size=(10, 10), map_cell_size=0.5,
        device="cpu", uncertain_params=("mass",),
    )
    want = n(rmodel.step(t(states), t(actions)))

    model = ParticleModel(control_type="velocity", deterministic=True,
                          max_speed=1.5, dt=rmodel.dt)
    got = np.asarray(model.step(jnp.asarray(states), jnp.asarray(actions)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_particle_step_acceleration_parity(ref):
    from sigsvgd_tpu.models.particle import ParticleModel

    rng = np.random.default_rng(12)
    states = rng.normal(size=(8, 4)).astype(np.float32)
    actions = rng.normal(scale=3.0, size=(8, 2)).astype(np.float32)
    masses = rng.uniform(0.5, 2.0, size=(8, 1)).astype(np.float32)

    rmodel = ref.particle.ParticleModel(
        control_type="acceleration", deterministic=True, max_speed=2.0,
        max_accel=1.0, init_state=[0.0] * 4, map_size=(10, 10),
        map_cell_size=0.5, device="cpu", uncertain_params=("mass",),
    )
    want = n(rmodel.step(t(states), t(actions), {"mass": t(masses)}))

    model = ParticleModel(control_type="acceleration", deterministic=True,
                          max_speed=2.0, max_accel=1.0, dt=rmodel.dt)
    got = np.asarray(
        model.step(jnp.asarray(states), jnp.asarray(actions),
                   {"mass": jnp.asarray(masses)})
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_particle_step_crash_freeze_parity(ref):
    """Crash-on-collision freeze with matched obstacle maps."""
    from sigsvgd_tpu.models.particle import ParticleModel
    from sigsvgd_tpu.utils import obstacle_map as om

    rmodel = ref.particle.ParticleModel(
        control_type="velocity", deterministic=True, can_crash=True,
        with_obstacle=True, obst_preset="single_centred", obst_width=4.0,
        init_state=[0.0, 0.0], map_size=(10, 10), map_cell_size=0.5,
        map_type="direct", device="cpu", uncertain_params=("mass",),
    )
    omap = om.generate_obstacle_map(
        (10, 10), om.obstacle_preset("single_centred", 4.0), 0.5
    )
    model = ParticleModel(control_type="velocity", deterministic=True,
                          can_crash=True, obstacle_map=omap, dt=rmodel.dt)

    # points inside (crash → frozen) and outside the centred 4x4 block
    states = np.array([[0.0, 0.0], [0.5, -0.5], [4.0, 4.0], [-4.0, 0.0]],
                      np.float32)
    actions = np.full((4, 2), 0.7, np.float32)
    want = n(rmodel.step(t(states), t(actions)))
    got = np.asarray(model.step(jnp.asarray(states), jnp.asarray(actions)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_obstacle_map_grid_and_lookup_parity(ref):
    from sigsvgd_tpu.utils import obstacle_map as om

    rmap = ref.om.generate_obstacle_map(
        (10, 10), ref.om.get_obst_preset("staggered_3-2-3", 2.0), 0.5,
        map_type="direct",
    )
    omap = om.generate_obstacle_map(
        (10, 10), om.obstacle_preset("staggered_3-2-3", 2.0), 0.5
    )
    np.testing.assert_array_equal(np.asarray(omap.grid), n(rmap.map))

    pts = np.random.default_rng(5).uniform(-6, 6, size=(64, 2)).astype(np.float32)
    want = n(rmap.get_collisions(t(pts)))
    got = np.asarray(om.get_collisions(omap, jnp.asarray(pts)))
    np.testing.assert_array_equal(got, want)


def test_pendulum_step_parity(ref):
    from sigsvgd_tpu.models.pendulum import PendulumModel

    rng = np.random.default_rng(13)
    states = rng.normal(scale=[np.pi, 4.0], size=(8, 2)).astype(np.float32)
    actions = rng.normal(scale=3.0, size=(8, 1)).astype(np.float32)
    g = rng.uniform(8, 11, size=(8, 1)).astype(np.float32)
    m = rng.uniform(0.5, 2, size=(8, 1)).astype(np.float32)

    rmodel = ref.pend.PendulumModel(uncertain_params=("g", "mass", "length"))
    want = n(rmodel.step(t(states), t(actions), {"g": t(g), "mass": t(m)}))

    model = PendulumModel(dt=rmodel.dt)
    got = np.asarray(model.step(jnp.asarray(states), jnp.asarray(actions),
                                {"g": jnp.asarray(g), "mass": jnp.asarray(m)}))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # observation convention
    np.testing.assert_allclose(
        np.asarray(PendulumModel.get_obs(jnp.asarray(states))),
        n(rmodel.get_obs(t(states))), rtol=1e-6,
    )


def test_cartpole_step_parity(ref):
    """Bit-level parity requires reference_mass_bug=True (the reference's
    `mass = m_c + m_c`, cartpole.py:162); our default uses m_c + m_p."""
    from sigsvgd_tpu.models.cartpole import CartPoleModel

    rng = np.random.default_rng(14)
    states = rng.normal(scale=0.3, size=(8, 4)).astype(np.float32)
    actions = rng.normal(size=(8, 1)).astype(np.float32)

    rmodel = ref.cart.CartPoleModel(uncertain_params=("g",))
    # the reference's step reads `self.__params_dict` from inside
    # CartPoleModel, but the attribute is name-mangled onto BaseModel
    # (cartpole.py:152,157 vs base.py:37) — an AttributeError in the
    # reference itself; alias it so the dynamics can run at all.
    rmodel._CartPoleModel__params_dict = rmodel.params_dict
    want = n(rmodel.step(t(states), t(actions)))

    model = CartPoleModel(dt=rmodel.dt, reference_mass_bug=True)
    got = np.asarray(model.step(jnp.asarray(states), jnp.asarray(actions)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # and the corrected dynamics must genuinely differ (total mass m_c + m_p)
    fixed = CartPoleModel(dt=rmodel.dt, reference_mass_bug=False)
    assert not np.allclose(
        np.asarray(fixed.step(jnp.asarray(states), jnp.asarray(actions))), want
    )


def test_skid_steer_step_parity(ref):
    from sigsvgd_tpu.models.skid_steer import SkidSteerModel

    rng = np.random.default_rng(15)
    states = rng.normal(size=(8, 5)).astype(np.float32)
    actions = rng.uniform(-1, 1, size=(8, 2)).astype(np.float32)
    icr = rng.uniform(0.1, 0.4, size=(8, 1)).astype(np.float32)

    rmodel = ref.skid.SkidSteerRobot(delta_t=0.05, uncertain_params=("x_icr",))
    want = n(rmodel.step(t(states), t(actions), {"x_icr": t(icr)}))

    model = SkidSteerModel(
        dt=rmodel.dt,
        min_wheel_speed=float(rmodel.action_space.low[0]),
        max_wheel_speed=float(rmodel.action_space.high[0]),
    )
    got = np.asarray(model.step(jnp.asarray(states), jnp.asarray(actions),
                                {"x_icr": jnp.asarray(icr)}))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# §4 SVGD velocity + step  (reference src/inference/svgd.py:46-116)
# ---------------------------------------------------------------------------

def _ref_svgd(ref, **kw):
    return ref.svgd.SVGD(kernel=ref.kern.GaussianKernel(), **kw)


def test_svgd_velocity_parity(ref, data):
    """phi on fixed particles + fixed score: ours equals MINUS the reference's
    `velocity` (the reference returns the negated update direction its
    optimizer then descends; both sides apply x ← x + lr·phi net)."""
    from sigsvgd_tpu.inference.svgd import SVGD, ScoreResult
    from sigsvgd_tpu.kernels.rbf import GaussianKernel

    score = np.random.default_rng(21).normal(size=data.X.shape).astype(np.float32)

    rs = _ref_svgd(ref)
    want_vel, iter_dict = rs._velocity(t(data.X), t(score))

    svgd = SVGD(kernel=GaussianKernel())
    phi, _ = svgd.velocity(
        jnp.asarray(data.X),
        ScoreResult(grad_log_p=jnp.asarray(score), loss=None, k_xx=None,
                    grad_k=None, aux=None),
        step=jnp.zeros((), jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(phi), -n(want_vel), rtol=1e-4, atol=2e-5)
    # the logged Gram matches too
    K, _ = GaussianKernel()(jnp.asarray(data.X), jnp.asarray(data.X))
    np.testing.assert_allclose(np.asarray(K), n(iter_dict["k_xx"]), rtol=1e-4,
                               atol=1e-5)


def test_svgd_log_prior_parity(ref, data):
    """log_prior gradient added to the score (reference svgd.py:75-79)."""
    from sigsvgd_tpu.inference.svgd import SVGD, ScoreResult
    from sigsvgd_tpu.kernels.rbf import GaussianKernel

    score = np.random.default_rng(22).normal(size=data.X.shape).astype(np.float32)

    def ref_prior(x):
        return -0.5 * (x ** 2).sum(-1)

    def jax_prior(x):
        return -0.5 * jnp.sum(x ** 2, axis=-1)

    rs = _ref_svgd(ref, log_prior=ref_prior)
    want_vel, _ = rs._velocity(t(data.X), t(score))

    svgd = SVGD(kernel=GaussianKernel(), log_prior=jax_prior)
    phi, _ = svgd.velocity(
        jnp.asarray(data.X),
        ScoreResult(grad_log_p=jnp.asarray(score), loss=None, k_xx=None,
                    grad_k=None, aux=None),
        step=jnp.zeros((), jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(phi), -n(want_vel), rtol=1e-4, atol=2e-5)


def test_svgd_adagrad_step_parity(ref, data):
    """Raw-lr hand-rolled Adagrad path (reference svgd.py:110-115)."""
    from sigsvgd_tpu.inference.svgd import SVGD, ScoreResult, SVGDState
    from sigsvgd_tpu.kernels.rbf import GaussianKernel

    score = np.random.default_rng(23).normal(size=data.X.shape).astype(np.float32)

    rs = _ref_svgd(ref, optimizer_class=None, adaptive_gradient=True, lr=0.05)
    want_x, _ = rs.step(t(data.X), t(score))

    svgd = SVGD(kernel=GaussianKernel(), lr=0.05, adagrad=True)
    state = svgd.init(jnp.asarray(data.X))
    sr = ScoreResult(grad_log_p=jnp.asarray(score), loss=None, k_xx=None,
                     grad_k=None, aux=None)
    x1, _ = svgd.step_update(jnp.asarray(data.X), state, sr)
    np.testing.assert_allclose(np.asarray(x1), n(want_x), rtol=1e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# §5 schedulers / UTF / likelihoods
# ---------------------------------------------------------------------------

def test_scheduler_parity(ref):
    from sigsvgd_tpu.utils import schedulers as sch

    rsq = ref.sched.SquareRootScheduler(2.0)
    rfa = ref.sched.FactorScheduler(1.0, 0.9, 1e-3)
    rco = ref.sched.CosineScheduler(1.0, 0.1, 20, warmup_steps=3)
    sq, fa, co = sch.square_root(2.0), sch.factor(1.0, 0.9, 1e-3), sch.cosine(
        1.0, 0.1, 20, warmup_steps=3
    )
    for step in range(30):
        assert float(sq(step)) == pytest.approx(float(rsq()), rel=1e-6)
        assert float(fa(step)) == pytest.approx(float(rfa()), rel=1e-6)
        assert float(co(step)) == pytest.approx(float(rco()), rel=1e-5)


def test_utf_parity_with_matched_sqrt(ref):
    """With alpha matched and the reference's sqrt_method injected as the
    LOWER Cholesky factor (our convention — the reference's default
    `torch.cholesky(x, upper=True)` both no longer exists in torch 2.x and
    is the documented transposition slip, utf.py docstring), sigma points
    and weights agree exactly."""
    from sigsvgd_tpu.utils.utf import MerweScaledUTF

    nn = 3
    rng = np.random.default_rng(31)
    mu = rng.normal(size=nn).astype(np.float32)
    A = rng.normal(size=(nn, nn)).astype(np.float32)
    cov = (A @ A.T + np.eye(nn)).astype(np.float32)

    rutf = ref.utf.MerweScaledUTF(
        nn, alpha=1.0, beta=2.0, kappa=0.0,
        sqrt_method=lambda x: torch.linalg.cholesky(x),
    )
    mine = MerweScaledUTF(nn, alpha=1.0, beta=2.0, kappa=0.0)

    np.testing.assert_allclose(np.asarray(mine.loc_weights), n(rutf.loc_weights),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mine.cov_weights), n(rutf.cov_weights),
                               rtol=1e-6)

    want_pts = n(ref.utf.sigma_points(rutf, t(mu), t(cov))
                 if hasattr(ref.utf, "sigma_points")
                 else rutf.compute_sigma_points(t(mu), t(cov)))
    got_pts = np.asarray(mine.compute_sigma_points(jnp.asarray(mu),
                                                   jnp.asarray(cov)))
    np.testing.assert_allclose(got_pts, want_pts, rtol=1e-4, atol=1e-5)


def test_exponentiated_utility_parity(ref):
    from sigsvgd_tpu.inference.likelihoods import ExponentiatedUtility

    costs = np.array([[3.0, 1.5, 0.2, 7.0]], np.float32).T.reshape(-1)
    rlik = ref.lik.ExponentiatedUtility(0.5)
    want = n(rlik.log_p(t(costs.reshape(-1, 1))))
    got = np.asarray(ExponentiatedUtility(0.5).log_p(jnp.asarray(costs)))
    np.testing.assert_allclose(got.reshape(-1), want.reshape(-1), rtol=1e-6)


# ---------------------------------------------------------------------------
# §6 Controllers — one DuSt iteration with injected identical samples
# ---------------------------------------------------------------------------

_H, _NPOL, _NSAMP = 5, 4, 3


def _pend_cost_fns_torch():
    def inst(x, a, n_pol=None, **kw):
        return x[..., 0] ** 2 + 0.1 * x[..., 1] ** 2 + 1e-3 * a[..., 0] ** 2

    def term(x, n_pol=None, **kw):
        return 2.0 * (x[..., 0] ** 2 + 0.1 * x[..., 1] ** 2)

    return inst, term


def _pend_cost_fns_jax():
    def inst(x, a, **kw):
        return x[..., 0] ** 2 + 0.1 * x[..., 1] ** 2 + 1e-3 * a[..., 0] ** 2

    def term(x, **kw):
        return 2.0 * (x[..., 0] ** 2 + 0.1 * x[..., 1] ** 2)

    return inst, term


def _make_ref_dust(ref, n_action_samples, pol0, lr=0.1, roll='repeat',
                   kernel_mode='trajectory'):
    import src.utils.spaces as rspaces

    rmodel = ref.pend.PendulumModel(uncertain_params=("g",))
    inst, term = _pend_cost_fns_torch()
    import src.controllers.dust as rdust

    if kernel_mode == 'policy':
        # a plain analytic kernel on the flattened policies: TrajectorySVGD's
        # `analytic_grad` fallback branch (trajectory_svgd.py:70-73)
        kern = ref.kern.GaussianKernel(bandwidth_fn=lambda d2: torch.tensor(0.7))
    else:
        kern = __import__(
            "src.kernels._traj_kernels", fromlist=["TrajectoryKernel"]
        ).TrajectoryKernel(bandwidth_fn=lambda d2: torch.tensor(0.7))
    ctrl = rdust.DuSt(
        observation_space=rspaces.Box(
            dim=2, low=-torch.tensor([1e6, 8.0]), high=torch.tensor([1e6, 8.0]),
            dtype=torch.float,
        ),
        action_space=rspaces.Box(dim=1, low=-2.0, high=2.0, dtype=torch.float),
        hz_len=_H,
        n_pol=_NPOL,
        n_action_samples=n_action_samples,
        n_params_samples=0,
        pol_hyper_prior=False,
        stein_sampler="SVGD",
        # fixed bandwidth: the median heuristic's subgradient lands on ONE of
        # the two tied symmetric Gram entries, and torch/jax break that tie
        # differently — a fixed h makes the kernel gradient deterministic
        kernel=kern,
        temperature=0.5,
        inst_cost_fn=inst,
        term_cost_fn=term,
        device="cpu",
        roll_strategy=roll,
        optimizer_class=None,
        lr=lr,
    )
    # the reference's _init_policies asserts against self.policies_shape
    # before defining it when pol_mean is passed (dust.py:195-197) — init
    # randomly, then overwrite policies and rebuild the GMM prior
    ctrl.pol_mean = t(pol0)
    ctrl.prior = rdust.to_gmm(ctrl.pol_mean, ctrl.prior_weights, ctrl.pol_cov)
    return ctrl, rmodel


def _make_my_dust(n_action_samples, lr=0.1, roll='repeat',
                  kernel_mode='trajectory'):
    from sigsvgd_tpu.controllers.dust import DuSt
    from sigsvgd_tpu.models.pendulum import PendulumModel

    from sigsvgd_tpu.kernels.rbf import GaussianKernel

    inst, term = _pend_cost_fns_jax()
    return DuSt(
        model=PendulumModel(),
        hz_len=_H,
        n_pol=_NPOL,
        n_action_samples=n_action_samples,
        n_params_samples=0,
        temperature=0.5,
        pol_hyper_prior=False,
        kernel_mode=kernel_mode,
        kernel=GaussianKernel(bandwidth_fn=lambda d2: 0.7),
        stein_sampler="SVGD",
        optimizer=None,
        lr=lr,
        roll_strategy=roll,
        inst_cost_fn=inst,
        term_cost_fn=term,
    )


def test_dust_forward_mc_path_parity(ref, monkeypatch):
    """Full DuSt.forward (1 SVGD iteration, Monte-Carlo likelihood-gradient
    path, trajectory kernel) against the torch reference with the SAME action
    samples injected on both sides: updated policies, best action sequence,
    policy weights, and rollout costs must agree."""
    import src.controllers.dust as rdust

    from sigsvgd_tpu.controllers.dust import DuStState

    rng = np.random.default_rng(41)
    pol0 = rng.uniform(-1.5, 1.5, size=(_NPOL, _H, 1)).astype(np.float32)
    state0 = np.array([np.pi / 4, 0.5], np.float32)

    # replicate the jax implementation's PRNG stream to extract its eps draw
    key0 = jax.random.PRNGKey(5)
    k2, _ = jax.random.split(key0)
    step_keys = jax.random.split(k2, 2)
    eps = np.asarray(
        jax.random.normal(step_keys[0], (_NSAMP, _NPOL, _H, 1), jnp.float32)
    )

    def fake_sample(self, pol_mean=None):
        pm = pol_mean if pol_mean is not None else self.pol_mean
        return pm + t(eps)  # pol_cov = I → actions = mean + eps, graph kept

    monkeypatch.setattr(rdust.DuSt, "_sample_actions", fake_sample)

    rctrl, rmodel = _make_ref_dust(ref, _NSAMP, pol0)
    a_seq_ref, data_ref = rctrl.forward(t(state0), rmodel, None, opt_steps=1)

    dust = _make_my_dust(_NSAMP)
    ctrl = dust.init(jax.random.PRNGKey(0), pol_mean=jnp.asarray(pol0))
    a_seq, new_ctrl, data = dust.forward(
        jnp.asarray(state0), ctrl, None, key0, opt_steps=1
    )

    np.testing.assert_allclose(
        np.asarray(data.costs[0]), n(data_ref[0]["costs"]), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(a_seq), n(a_seq_ref), rtol=2e-4, atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(data.pol_weights),
        n(rctrl._get_pol_weights(data_ref[0]["costs"])),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(new_ctrl.pol_mean), n(rctrl.pol_mean), rtol=2e-4, atol=3e-4
    )


@pytest.mark.slow
def test_dust_autograd_path_score_parity(ref, monkeypatch):
    """n_action_samples=0 (autodiff likelihood): full score parity.

    Our min-subtraction is DETACHED (controllers/dust.py::_log_lik docstring)
    while the reference's flows through autograd — but for the autograd path
    the costs are a 1-D [n_pol] vector and the reference's
    `torch.atleast_2d(costs).shape[0]` check (likelihoods.py:84-88) evaluates
    to 1, so it never subtracts the min there at all. Net effect: the scores
    agree exactly (the deviation only shifts the *logged loss* by a
    constant)."""
    import src.controllers.dust as rdust

    rng = np.random.default_rng(43)
    pol0 = rng.uniform(-1.5, 1.5, size=(_NPOL, _H, 1)).astype(np.float32)
    state0 = np.array([np.pi / 4, 0.5], np.float32)

    rctrl, rmodel = _make_ref_dust(ref, 0, pol0)
    X = t(pol0).requires_grad_(True)
    actions = X
    costs, trajs, _ = rctrl._get_costs(t(state0), actions, rmodel, None)
    grad_ref, _ = rctrl._get_grad_log_p(costs, actions)
    grad_ref = n(grad_ref)

    dust = _make_my_dust(0)
    from sigsvgd_tpu.utils import distributions as du

    prior = du.ParticleGMM(
        means=jnp.asarray(pol0.reshape(_NPOL, -1)),
        var=dust._prior_var(),
        weights=jnp.ones((_NPOL,)),
    )
    score, _ = dust._score(
        jnp.asarray(pol0), jnp.asarray(state0), prior, None, jax.random.PRNGKey(1)
    )
    grad_mine = np.asarray(score.grad_log_p)
    np.testing.assert_allclose(grad_ref, grad_mine, rtol=2e-4, atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(score.aux["costs"]), n(costs), rtol=1e-4, atol=1e-4
    )


def test_disco_rollout_parity(ref, monkeypatch):
    """DISCO trajectory generation with injected eps. (The reference's
    `forward` itself is bit-rotted — `a_mat`/`n_pol` undefined, `_rollout`
    arity mismatch with the `ext_actions` it passes — so parity is asserted
    at the `_rollout` level, plus the softmax plan-update math on its
    output, mirroring disco.py:362-376 single-policy.)"""
    import src.controllers.disco as rdisco
    import src.utils.spaces as rspaces

    from sigsvgd_tpu.controllers.disco import DISCO
    from sigsvgd_tpu.models.pendulum import PendulumModel

    rng = np.random.default_rng(47)
    n_act, H = 6, 5
    a_seq0 = rng.normal(scale=0.3, size=(H, 1)).astype(np.float32)
    eps = rng.normal(size=(n_act, H, 1)).astype(np.float32)
    state0 = np.array([np.pi / 3, -0.2], np.float32)

    inst, term = _pend_cost_fns_torch()
    rctrl = rdisco.DISCO(
        observation_space=rspaces.Box(
            dim=2, low=-torch.tensor([1e6, 8.0]), high=torch.tensor([1e6, 8.0]),
            dtype=torch.float,
        ),
        action_space=rspaces.Box(dim=1, low=-2.0, high=2.0, dtype=torch.float),
        hz_len=H,
        pol_samples=n_act,
        params_sampling="none",
        inst_cost_fn=inst,
        term_cost_fn=term,
        init_policy=t(a_seq0),
    )
    monkeypatch.setattr(
        rctrl.a_dist.__class__, "sample",
        lambda self, sample_shape=torch.Size(): t(eps),
    )
    rmodel = ref.pend.PendulumModel(uncertain_params=("g",))
    states_ref, actions_ref, eps_ref, _ = rctrl._rollout(t(state0), rmodel, None)

    disco = DISCO(
        model=PendulumModel(), hz_len=H, n_actions=n_act,
        inst_cost_fn=_pend_cost_fns_jax()[0], term_cost_fn=_pend_cost_fns_jax()[1],
    )
    actions = jnp.asarray(a_seq0)[None] + jnp.asarray(eps)
    states, costs = disco._mc_rollout(
        jnp.asarray(state0), actions, None, jax.random.PRNGKey(0)
    )

    np.testing.assert_allclose(
        np.asarray(actions), n(actions_ref).reshape(n_act, H, 1), rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(states), n(states_ref).reshape(n_act, H + 1, 2), rtol=1e-4,
        atol=1e-5,
    )


def test_closed_loop_control_mse_parity(ref, monkeypatch):
    """BASELINE 'control MSE vs reference at matched horizon/particle count':
    a 4-step closed-loop pendulum MPC run (DuSt, MC likelihood path, 1 SVGD
    iteration per solve, repeat-roll) with the SAME action samples injected
    on both sides must produce matching control sequences and state
    trajectories end-to-end (prior rebuild + roll + warm-started particles
    all participate across steps)."""
    import src.controllers.dust as rdust

    n_steps = 4
    rng = np.random.default_rng(47)
    pol0 = rng.uniform(-1.5, 1.5, size=(_NPOL, _H, 1)).astype(np.float32)
    state0 = np.array([np.pi / 2, 0.2], np.float32)

    # replicate the jax DuSt.forward PRNG stream per MPC step to extract the
    # eps draws the reference side must consume
    mpc_keys = jax.random.split(jax.random.PRNGKey(11), n_steps)
    eps_queue = []
    for s in range(n_steps):
        k_after, _k_par = jax.random.split(mpc_keys[s])
        step_keys = jax.random.split(k_after, 2)  # opt_steps=1 (+ roll key)
        eps_queue.append(
            np.asarray(
                jax.random.normal(step_keys[0], (_NSAMP, _NPOL, _H, 1),
                                  jnp.float32)
            )
        )

    calls = {"i": 0}

    def fake_sample(self, pol_mean=None):
        pm = pol_mean if pol_mean is not None else self.pol_mean
        eps = eps_queue[calls["i"]]
        calls["i"] += 1
        return pm + t(eps)

    monkeypatch.setattr(rdust.DuSt, "_sample_actions", fake_sample)

    # -- reference closed loop ---------------------------------------------
    rctrl, rmodel = _make_ref_dust(ref, _NSAMP, pol0)
    rstate = t(state0)
    ref_actions, ref_states = [], []
    for s in range(n_steps):
        a_seq_ref, _ = rctrl.forward(rstate, rmodel, None, opt_steps=1)
        rstate = rmodel.step(rstate[None], a_seq_ref[0:1][None])[0, 0]
        ref_actions.append(n(a_seq_ref[0]))
        ref_states.append(n(rstate))

    # -- TPU-native closed loop --------------------------------------------
    from sigsvgd_tpu.models.pendulum import PendulumModel

    dust = _make_my_dust(_NSAMP)
    model = PendulumModel()
    ctrl = dust.init(jax.random.PRNGKey(0), pol_mean=jnp.asarray(pol0))
    state = jnp.asarray(state0)
    my_actions, my_states = [], []
    for s in range(n_steps):
        a_seq, ctrl, _ = dust.forward(state, ctrl, None, mpc_keys[s],
                                      opt_steps=1)
        state = model.step(state[None], a_seq[0:1])[0]
        my_actions.append(np.asarray(a_seq[0]))
        my_states.append(np.asarray(state))

    ref_a, my_a = np.stack(ref_actions), np.stack(my_actions)
    ref_s, my_s = np.stack(ref_states), np.stack(my_states)
    control_mse = float(((ref_a - my_a) ** 2).mean())
    state_mse = float(((ref_s - my_s) ** 2).mean())
    assert control_mse < 1e-6, (control_mse, ref_a, my_a)
    assert state_mse < 1e-5, (state_mse, ref_s, my_s)


@pytest.mark.parametrize("roll", ["repeat", "mean"])
def test_closed_loop_autograd_path_parity(ref, monkeypatch, roll):
    """Step-locked closed-loop replay of the AUTODIFF likelihood path
    (n_action_samples=0 — fully deterministic, so no sample injection is
    needed): 4 pendulum MPC steps with 2 SVGD iterations per solve.

    Expected deviation (asserted below): the reference evaluates the GMM
    prior gradient at ``self.pol_mean`` (``dust.py:348-350``), which stays
    frozen at the solve's INITIAL particles throughout ``SVGD.optimize``
    (optimize works on a detached copy and writes back only at the end,
    ``svgd.py:156``) — so from the second SVGD iteration on, its prior term
    is stale. We evaluate the score at the CURRENT particles (the SVGD
    update rule's definition). With the reference's prior evaluation
    corrected to the current particles, the control sequences match step
    for step; against the unpatched reference the difference is small but
    real (~1e-3 control MSE over 4 steps)."""
    import src.controllers.dust as rdust

    n_steps = 4
    rng = np.random.default_rng(53)
    pol0 = rng.uniform(-1.5, 1.5, size=(_NPOL, _H, 1)).astype(np.float32)
    state0 = np.array([np.pi / 2, 0.2], np.float32)

    def run_ref():
        rctrl, rmodel = _make_ref_dust(ref, 0, pol0, roll=roll)
        rstate = t(state0)
        acts = []
        for _s in range(n_steps):
            a_seq_ref, _ = rctrl.forward(rstate, rmodel, None, opt_steps=2)
            rstate = rmodel.step(rstate[None], a_seq_ref[0:1][None])[0, 0]
            acts.append(n(a_seq_ref[0]))
        return np.stack(acts)

    ref_stale = run_ref()

    orig = rdust.DuSt._get_grad_log_p

    def fresh_prior_grad(self, costs, actions):
        # evaluate the prior gradient at the CURRENT particles (autograd
        # path: actions IS the particle tensor), not the stale pol_mean
        with torch.no_grad():
            grad_pri = rdust.grad_gmm_log_p(self.prior, actions.detach())
        log_lik = self.likelihood.log_p(costs)
        grad_lik = torch.autograd.grad(
            log_lik.sum(), actions, retain_graph=True
        )[0]
        return grad_pri + grad_lik, -log_lik

    monkeypatch.setattr(rdust.DuSt, "_get_grad_log_p", fresh_prior_grad)
    ref_fresh = run_ref()
    monkeypatch.setattr(rdust.DuSt, "_get_grad_log_p", orig)

    from sigsvgd_tpu.models.pendulum import PendulumModel

    dust = _make_my_dust(0, roll=roll)
    model = PendulumModel()
    ctrl = dust.init(jax.random.PRNGKey(0), pol_mean=jnp.asarray(pol0))
    state = jnp.asarray(state0)
    mpc_keys = jax.random.split(jax.random.PRNGKey(29), n_steps)
    my_actions = []
    for s in range(n_steps):
        a_seq, ctrl, _ = dust.forward(state, ctrl, None, mpc_keys[s],
                                      opt_steps=2)
        state = model.step(state[None], a_seq[0:1])[0]
        my_actions.append(np.asarray(a_seq[0]))
    my_a = np.stack(my_actions)

    mse_fresh = float(((ref_fresh - my_a) ** 2).mean())
    mse_stale = float(((ref_stale - my_a) ** 2).mean())
    assert mse_fresh < 1e-6, (mse_fresh, ref_fresh, my_a)
    # the stale-prior quirk is a real, expected difference
    assert 1e-5 < mse_stale < 1e-1, mse_stale


def _patch_fresh_prior(monkeypatch, rdust):
    """Patch the reference's documented stale-prior quirk (see
    test_closed_loop_autograd_path_parity): evaluate the GMM prior gradient
    at the CURRENT particles so both sides implement the same update rule."""

    def fresh_prior_grad(self, costs, actions):
        with torch.no_grad():
            grad_pri = rdust.grad_gmm_log_p(self.prior, actions.detach())
        log_lik = self.likelihood.log_p(costs)
        grad_lik = torch.autograd.grad(
            log_lik.sum(), actions, retain_graph=True
        )[0]
        return grad_pri + grad_lik, -log_lik

    monkeypatch.setattr(rdust.DuSt, "_get_grad_log_p", fresh_prior_grad)


def test_closed_loop_policy_kernel_parity(ref, monkeypatch):
    """Step-locked closed-loop replay of the POLICY-space kernel mode: the
    reference runs a plain analytic GaussianKernel on the flattened policy
    particles (TrajectorySVGD's ``analytic_grad`` fallback,
    ``trajectory_svgd.py:70-73``); ours is ``kernel_mode="policy"``.
    Autodiff likelihood path (deterministic), 4 MPC steps × 2 SVGD
    iterations, repeat roll.

    REFERENCE BUG (asserted below): the fallback does ``grad_k.sum(1)`` on a
    kernel gradient the analytic kernels ALREADY aggregate over their second
    argument (``_kernels.py:64-115`` return dK as [n, d]) — so DuSt with a
    plain kernel crashes upstream with a shape error. We patch the branch to
    consume (K, dK) as returned — the vanilla-SVGD semantics
    (``svgd.py:46-91``) the fallback clearly intends — and replay against
    that."""
    import src.controllers.dust as rdust
    import src.inference.trajectory_svgd as rtsvgd

    n_steps = 4
    rng = np.random.default_rng(61)
    pol0 = rng.uniform(-1.5, 1.5, size=(_NPOL, _H, 1)).astype(np.float32)
    state0 = np.array([np.pi / 2, 0.2], np.float32)

    _patch_fresh_prior(monkeypatch, rdust)
    rctrl, rmodel = _make_ref_dust(ref, 0, pol0, kernel_mode="policy")
    rstate = t(state0)

    with pytest.raises(RuntimeError, match="must match"):
        rctrl.forward(rstate, rmodel, None, opt_steps=1)

    def fixed_compute_kernel(self, X, **kwargs):
        k_xx, grad_k = self.kernel(X, X)
        return k_xx.detach(), grad_k.detach()

    monkeypatch.setattr(
        rtsvgd.TrajectorySVGD, "_compute_kernel", fixed_compute_kernel
    )
    rctrl, rmodel = _make_ref_dust(ref, 0, pol0, kernel_mode="policy")
    ref_actions = []
    for _s in range(n_steps):
        a_seq_ref, _ = rctrl.forward(rstate, rmodel, None, opt_steps=2)
        rstate = rmodel.step(rstate[None], a_seq_ref[0:1][None])[0, 0]
        ref_actions.append(n(a_seq_ref[0]))

    from sigsvgd_tpu.models.pendulum import PendulumModel

    dust = _make_my_dust(0, kernel_mode="policy")
    model = PendulumModel()
    ctrl = dust.init(jax.random.PRNGKey(0), pol_mean=jnp.asarray(pol0))
    state = jnp.asarray(state0)
    mpc_keys = jax.random.split(jax.random.PRNGKey(31), n_steps)
    my_actions = []
    for s in range(n_steps):
        a_seq, ctrl, _ = dust.forward(state, ctrl, None, mpc_keys[s],
                                      opt_steps=2)
        state = model.step(state[None], a_seq[0:1])[0]
        my_actions.append(np.asarray(a_seq[0]))

    mse = float(((np.stack(ref_actions) - np.stack(my_actions)) ** 2).mean())
    assert mse < 1e-6, (mse, np.stack(ref_actions), np.stack(my_actions))


def test_closed_loop_resample_roll_parity(ref, monkeypatch):
    """Step-locked closed-loop replay of the RESAMPLE roll strategy
    (``dust.py:433-437``): the horizon shift's last action is drawn from the
    policy GMM prior. The same draws are injected on both sides (the prior
    itself is rebuilt deterministically from the rolled particles each
    step, so injected draws keep the loops step-locked).

    REFERENCE BUG (asserted below): ``DuSt.roll(strategy="resample")`` reads
    ``self.n_particles`` (``dust.py:437``), an attribute DuSt never defines
    (the policy count is ``n_pol``) — the strategy crashes upstream with an
    AttributeError. We patch ``roll`` with the attribute corrected and
    replay against that."""
    import src.controllers.dust as rdust
    from sigsvgd_tpu.controllers import dust as my_dust_mod

    n_steps = 4
    rng = np.random.default_rng(67)
    pol0 = rng.uniform(-1.5, 1.5, size=(_NPOL, _H, 1)).astype(np.float32)
    state0 = np.array([np.pi / 2, 0.2], np.float32)
    draw_queue = [
        rng.uniform(-1.0, 1.0, size=(_NPOL, _H, 1)).astype(np.float32)
        for _ in range(n_steps)
    ]

    _patch_fresh_prior(monkeypatch, rdust)
    ref_i = {"i": 0}

    def ref_sample(self, sample_shape=torch.Size()):
        v = draw_queue[ref_i["i"]]
        ref_i["i"] += 1
        return t(v)

    monkeypatch.setattr(
        torch.distributions.MixtureSameFamily, "sample", ref_sample
    )

    rctrl, rmodel = _make_ref_dust(ref, 0, pol0, roll="resample")
    rstate = t(state0)
    with pytest.raises(AttributeError, match="n_particles"):
        rctrl.forward(rstate, rmodel, None, opt_steps=1)

    def fixed_roll(self, steps=-1, strategy="repeat"):
        self.pol_mean = self.pol_mean.roll(steps, dims=-2)
        self.pol_mean[..., -1, :] = self.prior.sample([self.n_pol])[..., -1, :]

    monkeypatch.setattr(rdust.DuSt, "roll", fixed_roll)
    ref_i["i"] = 0
    rctrl, rmodel = _make_ref_dust(ref, 0, pol0, roll="resample")
    rstate = t(state0)
    ref_actions = []
    for _s in range(n_steps):
        a_seq_ref, _ = rctrl.forward(rstate, rmodel, None, opt_steps=2)
        rstate = rmodel.step(rstate[None], a_seq_ref[0:1][None])[0, 0]
        ref_actions.append(n(a_seq_ref[0]))

    my_i = {"i": 0}
    orig_sample = my_dust_mod.du.sample

    def my_sample(dist, key, shape):
        v = draw_queue[my_i["i"]]
        my_i["i"] += 1
        return jnp.asarray(v).reshape(shape[0], -1)

    monkeypatch.setattr(my_dust_mod.du, "sample", my_sample)
    try:
        from sigsvgd_tpu.models.pendulum import PendulumModel

        dust = _make_my_dust(0, roll="resample")
        model = PendulumModel()
        ctrl = dust.init(jax.random.PRNGKey(0), pol_mean=jnp.asarray(pol0))
        state = jnp.asarray(state0)
        mpc_keys = jax.random.split(jax.random.PRNGKey(37), n_steps)
        my_actions = []
        for s in range(n_steps):
            a_seq, ctrl, _ = dust.forward(state, ctrl, None, mpc_keys[s],
                                          opt_steps=2)
            state = model.step(state[None], a_seq[0:1])[0]
            my_actions.append(np.asarray(a_seq[0]))
    finally:
        monkeypatch.setattr(my_dust_mod.du, "sample", orig_sample)

    mse = float(((np.stack(ref_actions) - np.stack(my_actions)) ** 2).mean())
    assert mse < 1e-6, (mse, np.stack(ref_actions), np.stack(my_actions))


def test_scaled_svgd_velocity_parity(ref, data):
    """ScaledSVGD (GaussNewton metric) velocity on fixed particles + score —
    with and without preconditioning and with a log_prior. The reference
    builds the GN metric from the LIKELIHOOD score only and adds the prior
    gradient afterwards (svgd.py:212 vs :238-243); the metric uses
    eps = var(X) regularization.

    Reference bug worked around by a shim (not replicated here): its scaled
    kernels return the kernel gradient ALREADY aggregated over the second
    argument (``_kernels.py:185`` ``d_K.sum(1)``), and ``ScaledSVGD._velocity``
    aggregates again (``svgd.py:230`` ``grad_k.sum(1)``) — so the reference's
    analytic ScaledSVGD path crashes on a shape error as shipped. The shim
    re-inserts a singleton axis so the double aggregation is the identity,
    recovering the intended math, which this implementation matches."""
    import torch

    from sigsvgd_tpu.inference.svgd import ScaledSVGD, ScoreResult
    from sigsvgd_tpu.kernels.rbf import ScaledGaussianKernel

    score = np.random.default_rng(31).normal(size=data.X.shape).astype(np.float32)

    def prior_t(x):
        return -0.05 * (x**2).sum(-1)

    def prior_j(x):
        return -0.05 * jnp.sum(x**2, axis=-1)

    class _Shim:
        # undoes the reference's double aggregation (see docstring)
        analytic_grad = True

        def __init__(self, k):
            self.k = k

        def __call__(self, X, Y, M=None, compute_grad=True):
            if not compute_grad:
                return self.k(X, Y, M=M, compute_grad=False)
            K, dK = self.k(X, Y, M=M)
            return K, dK.unsqueeze(1)

    for precondition in (True, False):
        for with_prior in (False, True):
            rs = ref.svgd.ScaledSVGD(
                kernel=_Shim(_ref_kernel(ref, "ScaledGaussianKernel")),
                log_prior=prior_t if with_prior else None,
                optimizer_class=None,
                precondition=precondition,
                lr=0.1,
            )
            (want,), _itd = rs._velocity(t(data.X), t(score))

            mine = ScaledSVGD(
                kernel=ScaledGaussianKernel(),
                log_prior=prior_j if with_prior else None,
                precondition=precondition,
            )
            phi, _ = mine.velocity(
                jnp.asarray(data.X),
                ScoreResult(grad_log_p=jnp.asarray(score), loss=None,
                            k_xx=None, grad_k=None, aux=None),
                step=jnp.zeros((), jnp.int32),
            )
            np.testing.assert_allclose(
                np.asarray(phi), -n(want), rtol=2e-4, atol=2e-4,
                err_msg=f"precondition={precondition} prior={with_prior}",
            )


# ---------------------------------------------------------------------------
# §9 closed-loop replay at the MAZE workload (VERDICT r2 item 5)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_closed_loop_maze_workload_parity(ref, monkeypatch):
    """Step-locked closed-loop replay of the reference's particle-maze
    configuration (``particle_maze_config.yaml:2-20``: H=30, 30 policies + 5
    action primitives, 10 action samples, opt_steps=2, Adam lr=1.0,
    ctrl_sigma=5, alpha=1, acceleration control through the sm_grid_4x4
    obstacle maze with crash-freeze and the config's cost weights) for 20
    environment steps, with the SAME action draws injected on both sides.
    The trajectory kernel stands in for the config's signature kernel
    (``sigkernel`` is not importable upstream in this image); the fixed
    bandwidth is the script's ``sqrt(ctrl_dim + horizon)``
    (``script_control_particle_maze.py:34-36``). The reference's stale-prior
    quirk is patched to the current particles on the torch side — the MC
    variant: both the GMM-prior point and the (actions − mean) score-function
    term use the frozen ``self.pol_mean`` upstream (``dust.py:349,356``).

    DIVERGENCE ANALYSIS (why raw-lr replaces the config's Adam here): with
    ``torch.optim.Adam(lr=1.0)`` both sides match for a full solve at
    opt_steps=1 (verified: 7e-6 max action diff) and synthetic 2-step Adam
    sequences agree to 2e-5, but the closed loop diverges: Adam's
    sign-normalizing update moves every element by ~±1.0, amplifying fp
    summation-order noise to ~4e-5 in the particles, and the maze's
    discontinuous crash cost (w_obs = 1e6 through a 0.01-cell occupancy
    lookup) flips whole trajectory costs on such differences — a chaotic
    system property, not an implementation gap. The raw-lr update keeps the
    two implementations within ~2e-6 per solve, below the flip threshold,
    and exercises the identical score/kernel/prior/roll pipeline."""
    import src.controllers.dust as rdust
    import src.utils.spaces as rspaces
    import optax

    H, NPOL, NPRIM, NSAMP = 30, 30, 5, 10
    n_total = NPOL + NPRIM
    n_steps = 20
    bw = float((2 + H) ** 0.5)
    cost_params = {
        "w_qpos": 0.5, "w_qvel": 0.25, "w_ctrl": 0.2, "w_obs": 1.0e6,
        "w_qpos_T": 1.0e3, "w_qvel_T": 0.1,
    }
    env = dict(
        dt=0.015, control_type="acceleration",
        init_state=[-1.8, -1.8, 0.0, 0.0], target_state=[1.8, 1.8, 0.0, 0.0],
        can_crash=True, with_obstacle=True, deterministic=True,
        obst_preset="sm_grid_4x4", obst_width=0.6, max_speed=5.0,
        map_cell_size=0.01, map_size=(4, 4),
    )
    rng = np.random.default_rng(31)
    pol0 = rng.uniform(-10.0, 10.0, size=(NPOL, H, 2)).astype(np.float32)
    prims = np.zeros((NPRIM, H, 2), np.float32)
    prims[1] = -10.0
    prims[2] = 10.0
    prims[3, ..., :] = np.array([-10.0, 10.0], np.float32)
    prims[4, ..., :] = np.array([10.0, -10.0], np.float32)
    state0 = np.array([-1.8, -1.8, 0.0, 0.0], np.float32)

    # -- shared injected draws (replicating the jax PRNG stream) ------------
    mpc_keys = jax.random.split(jax.random.PRNGKey(17), n_steps)
    eps_queue = []
    for s in range(n_steps):
        k_after, _k_par = jax.random.split(mpc_keys[s])
        step_keys = jax.random.split(k_after, 3)  # opt_steps=2 (+ roll key)
        for o in range(2):
            eps_queue.append(np.asarray(jax.random.normal(
                step_keys[o], (NSAMP, n_total, H, 2), jnp.float32)))

    calls = {"i": 0}

    def fake_sample(self, pol_mean=None):
        pm = pol_mean if pol_mean is not None else self.pol_mean
        # stash the CURRENT particles: the reference's MC gradient uses the
        # stale self.pol_mean for both the GMM-prior point and the
        # (actions - mean) score-function term (dust.py:349,356) — frozen
        # during SVGD.optimize, so wrong from the 2nd iteration on (the
        # documented stale-prior quirk, MC variant)
        self._cur_pol = pm.detach()
        eps = eps_queue[calls["i"]]
        calls["i"] += 1
        return pm + t(eps) @ torch.linalg.cholesky(self.pol_cov).T

    monkeypatch.setattr(rdust.DuSt, "_sample_actions", fake_sample)

    def fresh_mc_grad(self, costs, actions):
        cur = getattr(self, "_cur_pol", self.pol_mean)
        with torch.no_grad():
            grad_pri = rdust.grad_gmm_log_p(self.prior, cur)
            grad_log_pol = (actions - cur) @ self.pol_cov.inverse()
            log_lik = self.likelihood.log_p(costs)
            bc_dims = torch.Size([1]) * len(self.prior.event_shape)
            pol_weight = log_lik.reshape(log_lik.shape + bc_dims).softmax(dim=0)
            grad_lik = torch.sum(pol_weight * grad_log_pol, dim=0)
            loss = -log_lik.sum(0)
        return grad_pri + grad_lik, loss

    monkeypatch.setattr(rdust.DuSt, "_get_grad_log_p", fresh_mc_grad)

    # -- reference closed loop ----------------------------------------------
    rmodel = ref.particle.ParticleModel(
        noise_std=torch.tensor([0.1, 0.1]), map_type="direct", device="cpu",
        cost_params=dict(cost_params), uncertain_params=("mass",), **env,
    )
    kern = __import__(
        "src.kernels._traj_kernels", fromlist=["TrajectoryKernel"]
    ).TrajectoryKernel(bandwidth_fn=lambda *a: torch.tensor(bw))
    rctrl = rdust.DuSt(
        observation_space=rmodel.observation_space,
        action_space=rmodel.action_space,
        hz_len=H,
        n_pol=NPOL,
        n_action_samples=NSAMP,
        n_params_samples=0,
        pol_mean=None,  # upstream asserts on undefined policies_shape
        pol_cov=torch.eye(2) * 5.0**2,
        pol_hyper_prior=True,  # unbounded actions -> disabled by isinf gate
        stein_sampler="SVGD",
        kernel=kern,
        temperature=1.0,
        inst_cost_fn=rmodel.default_inst_cost,
        term_cost_fn=rmodel.default_term_cost,
        action_primitives=t(prims),
        optimizer_class=None,
        lr=1.0,
        device="cpu",
    )
    # overwrite the non-primitive rows and rebuild the GMM prior (the ctor
    # path for explicit pol_mean is bit-rotted upstream, dust.py:195-197)
    rctrl.pol_mean = torch.cat([t(prims), t(pol0)], dim=0)
    rctrl.prior = rdust.to_gmm(rctrl.pol_mean, rctrl.prior_weights, rctrl.pol_cov)
    rstate = t(state0)
    ref_actions, ref_states = [], []
    for s in range(n_steps):
        a_seq_ref, _ = rctrl.forward(rstate, rmodel, None, opt_steps=2)
        rstate = rmodel.step(rstate[None], a_seq_ref[0:1])[0]
        ref_actions.append(n(a_seq_ref[0]))
        ref_states.append(n(rstate))

    # -- TPU-native closed loop ----------------------------------------------
    from sigsvgd_tpu.controllers.dust import DuSt
    from sigsvgd_tpu.kernels.rbf import GaussianKernel
    from sigsvgd_tpu.models.particle import ParticleModel

    model = ParticleModel.create(
        noise_std=(0.1, 0.1), cost_params=dict(cost_params), **env
    )
    dust = DuSt(
        model=model,
        hz_len=H,
        n_pol=NPOL,
        n_prim=NPRIM,
        n_action_samples=NSAMP,
        n_params_samples=0,
        pol_cov=((25.0, 0.0), (0.0, 25.0)),
        temperature=1.0,
        pol_hyper_prior=True,
        kernel_mode="trajectory",
        kernel=GaussianKernel(bandwidth_fn=lambda d2: bw),
        stein_sampler="SVGD",
        optimizer=None,
        lr=1.0,
        inst_cost_fn=model.default_inst_cost,
        term_cost_fn=model.default_term_cost,
    )
    ctrl = dust.init(jax.random.PRNGKey(0), pol_mean=jnp.asarray(pol0),
                     action_primitives=jnp.asarray(prims))
    state = jnp.asarray(state0)
    my_actions, my_states = [], []
    fwd = jax.jit(lambda st, cs, k: dust.forward(st, cs, None, k, opt_steps=2))
    for s in range(n_steps):
        a_seq, ctrl, _ = fwd(state, ctrl, mpc_keys[s])
        state = model.step(state[None], a_seq[0:1])[0]
        my_actions.append(np.asarray(a_seq[0]))
        my_states.append(np.asarray(state))

    ref_a, my_a = np.stack(ref_actions), np.stack(my_actions)
    ref_s, my_s = np.stack(ref_states), np.stack(my_states)
    control_mse = float(((ref_a - my_a) ** 2).mean())
    state_mse = float(((ref_s - my_s) ** 2).mean())

    # driver-visible parity artifact (VERDICT r4 item 5): bench.py runs this
    # test with SIGSVGD_PARITY_OUT set and embeds the MSE in the round JSON,
    # so the driver tracks control parity alongside solves/s every round
    out = os.environ.get("SIGSVGD_PARITY_OUT")
    if out:
        import json

        with open(out, "w") as f:
            json.dump(
                {
                    "workload": "maze 20-step step-locked closed-loop replay"
                    " (particle_maze_config.yaml semantics, trajectory"
                    " kernel, raw-lr update)",
                    "n_steps": n_steps,
                    "control_mse_vs_reference": control_mse,
                    "state_mse_vs_reference": state_mse,
                },
                f,
            )

    assert control_mse < 1e-5, (control_mse, ref_a[:4], my_a[:4])
    assert state_mse < 1e-5, (state_mse, ref_s[:4], my_s[:4])
