"""Benchmark: flagship Stein-MPC solves/s on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

PRIMARY metric (VERDICT r1 item 2): the flagship workload — DuSt with the
SIGNATURE kernel on a 7-DoF Panda arm, H=40, 1024 policy particles, 2 SVGD
steps per MPC solve. Costs go through real kinematics: batched FK of all arm
links, exact scene-SDF collision occupancy over interpolated body points, and
end-effector target tracking (the cost structure of
``script_planning_robot.py:248-356`` applied in MPC form). The trajectory
kernel is the Goursat-PDE signature kernel on the rolled-out state paths.
The grid refinement is workload-CALIBRATED (``calibrate_dyadic_order``,
evidence in ``docs/adaptive_dyadic_study.md``): the reference config pins
dyadic_order 3 (``particle_maze_config.yaml:20``) as a generic safety
default, but on this workload's paths the z³ truncation bound shows the
unrefined λ=0 grid is converged below the fp32 floor — strictly MORE
accurate than λ=3 *within this framework's fp32 solver* (rounding grows
with cell count) and ~6x faster end-to-end. Caveat (ADVICE r4): the
reference itself computes the PDE in float64 (``_traj_kernels.py:205``),
where λ=3 is ~4 orders more accurate than λ=0 — the calibration argument
is about what fp32 can represent, not about matching the reference's fp64
accuracy. The JSON therefore carries the calibrated order, the solve rate
with the order pinned to the reference value, and ratios in which the CPU
baseline solves the SAME grid as the TPU side (VERDICT r4 item 2).

SECONDARY: the policy-space RBF DuSt solve (round-1 headline) on the same
model/costs.

Baselines are *measured here* (the reference publishes none): the same math
in PyTorch on CPU with per-op dispatch — the reference's execution model. The
signature baseline is measured at 8/16/32 particles and extrapolated to
1024 with the FITTED pair-count exponent (10⁶ fp64 PDE Grams on CPU would
take many hours); the JSON carries the measured points, the fit, and a
no-extrapolation measured-scale ratio at the largest measured size.

Extras: per-stage timings (rollout+FK+cost grad / signature Gram+adjoint /
full solve) and an MFU estimate from XLA's own cost analysis against the
v5e bf16 peak (197 TFLOP/s).
"""
from __future__ import annotations

import dataclasses
import json
import time

N_POL = 1024
HZ = 40
DOF = 7
OPT_STEPS = 2
DYADIC = 3
SIG_BW = 4.0  # fixed static-kernel bandwidth (flagship configs fix it too)
V5E_PEAK_FLOPS = 1.97e14  # bf16

_STATE = {}


def _setup():
    """Build the flagship problem once (robot, scene, model, controllers)."""
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/sigsvgd_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from sigsvgd_tpu.controllers import DuSt
    from sigsvgd_tpu.experiments.planning import create_body_points, sdf_occupancy
    from sigsvgd_tpu.kernels import GaussianKernel, SignatureKernel
    from sigsvgd_tpu.models.base import DynamicsModel, ParamsDict
    from sigsvgd_tpu.models.robot import PandaRobot, get_scene
    from sigsvgd_tpu.utils.spaces import Box

    robot = PandaRobot.create()
    scene = get_scene("bookshelf_small")
    occ = sdf_occupancy(scene)
    low, high = robot.joint_limits()

    @dataclasses.dataclass(frozen=True, eq=False)
    class ArmModel(DynamicsModel):
        """7-DoF joint-velocity integrator clipped to the Panda's limits."""

        @property
        def observation_space(self) -> Box:
            return Box.create(DOF, low=low, high=high)

        @property
        def action_space(self) -> Box:
            return Box.create(DOF, low=-2.0, high=2.0)

        def step(self, states, actions, params: ParamsDict = None, key=None):
            acts = jnp.clip(actions, -2.0, 2.0)
            return jnp.clip(states + acts * self.dt, low, high)

    model = ArmModel(dt=0.05)
    q_start = jnp.zeros((DOF,)).at[3].set(-1.5).at[5].set(1.5)
    q_target = jnp.asarray([1.2, 0.6, -0.4, -1.2, 0.3, 1.8, 0.5])
    ee_target = robot.ee_position(q_target[None])[0]

    def inst_cost(states, actions=None, **_):
        xs = robot.qs_to_joints_xs(states)  # [..., L, 3]
        body = create_body_points(xs, 4)
        col = occ(body).mean(-1)
        ee = xs[..., -1, :]
        reach = jnp.sum((ee - ee_target) ** 2, axis=-1)
        c = 2.0 * col + reach
        if actions is not None:
            c = c + 0.01 * jnp.sum(actions * actions, axis=-1)
        return c

    def term_cost(states, **_):
        xs = robot.qs_to_joints_xs(states)
        ee = xs[..., -1, :]
        return 10.0 * jnp.sum((ee - ee_target) ** 2, axis=-1)

    common = dict(
        model=model,
        hz_len=HZ,
        n_pol=N_POL,
        n_action_samples=0,
        optimizer=optax.adam(0.1),
        pol_hyper_prior=True,
        inst_cost_fn=inst_cost,
        term_cost_fn=term_cost,
    )
    sig_kernel = SignatureKernel(dyadic_order=DYADIC, bandwidth=SIG_BW)
    ctrl_pinned = DuSt(kernel_mode="signature", sig_kernel=sig_kernel, **common)
    # workload-calibrated grid refinement (docs/adaptive_dyadic_study.md):
    # on these short smooth τ paths the PDE coefficient is z ~ 1e-3, so the
    # λ=0 grid is converged below the fp32 floor and the refined reference
    # default burns 64x the cells for accuracy fp32 cannot represent. The
    # calibration measures the z³ truncation bound on a warm-up rollout's
    # paths (once, outside jit) and keeps λ=3 whenever it exceeds tolerance.
    cs0 = ctrl_pinned.init(jax.random.PRNGKey(0))
    _c0, trs0 = ctrl_pinned._rollout_costs(q_start, cs0.pol_mean, None)
    sig_cal = sig_kernel.calibrate_dyadic_order(ctrl_pinned._tau(trs0))
    ctrl_sig = dataclasses.replace(ctrl_pinned, sig_kernel=sig_cal)
    ctrl_rbf = DuSt(kernel_mode="policy", kernel=GaussianKernel(), **common)

    _STATE.update(
        jax=jax, jnp=jnp, robot=robot, model=model, q_start=q_start,
        ctrl_sig=ctrl_sig, ctrl_sig_pinned=ctrl_pinned, ctrl_rbf=ctrl_rbf,
        sig_kernel=sig_cal, inst_cost=inst_cost, term_cost=term_cost,
    )
    return _STATE


def _timed_chain(step_fn, x0, n_iters, x0_timed=None):
    """Steady-state ms/iter of a chained jitted step; the remote-execution
    tunnel pipelines aggressively, so time a dependent chain and force one
    full host sync (scalar pull) at the end. The timed chain starts from
    ``x0_timed`` (distinct from the warmup's ``x0``): a call repeating the
    warmup's exact arguments can be served from a remote memoization cache
    and would make the first iteration free."""
    x, s = step_fn(x0)
    _ = float(s)  # compile + first-run sync
    x = x0 if x0_timed is None else x0_timed
    t0 = time.perf_counter()
    for _i in range(n_iters):
        x, s = step_fn(x)
    _ = float(s)
    return (time.perf_counter() - t0) / n_iters


def bench_solver(ctrl, n_iters=8):
    jax, jnp = _STATE["jax"], _STATE["jnp"]
    model, q_start = _STATE["model"], _STATE["q_start"]
    key = jax.random.PRNGKey(0)
    cstate = ctrl.init(key)
    keys = jax.random.split(key, 64)

    @jax.jit
    def solve(carry):
        state, cs, i = carry
        a_seq, cs, _ = ctrl.forward(state, cs, None, keys[i % 64], opt_steps=OPT_STEPS)
        nxt = model.step(state[None], a_seq[0:1])[0]
        return (nxt, cs, i + 1), jnp.sum(nxt)

    def step(carry):
        return solve(carry)

    dt = _timed_chain(
        step,
        (q_start, cstate, jnp.zeros((), jnp.int32)),
        n_iters,
        x0_timed=(q_start + 1e-3, cstate, jnp.zeros((), jnp.int32)),
    )
    flops = _xla_flops(solve, ((q_start, cstate, jnp.zeros((), jnp.int32)),))
    return 1.0 / dt, dt, flops


def _pde_flops_per_solve(order: int = DYADIC) -> float:
    """Analytic FLOPs of the signature-kernel PDE work per MPC solve — the
    Pallas custom call is invisible to XLA's cost analysis, so the dominant
    term must be accounted by hand.  Per pair: G² fine nodes × ~4 flops for
    the forward recurrence; the adjoint pass costs ~3 forwards (value +
    checkpoint-remat + in-kernel re-forward) plus ~16 flops/node for the
    adjoint/reconstruction/dz sweeps; the static Gram + increments add
    ~24·L² per pair across passes."""
    pairs = N_POL * (N_POL + 1) // 2
    g2 = (HZ * 2**order) ** 2
    l2 = (HZ + 1) ** 2
    return OPT_STEPS * pairs * (28.0 * g2 + 24.0 * l2)


def _xla_flops(jitted, args):
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return None


def bench_stages(n_iters=6):
    """Per-stage steady-state timings for the signature solve."""
    jax, jnp = _STATE["jax"], _STATE["jnp"]
    ctrl, q_start = _STATE["ctrl_sig"], _STATE["q_start"]
    key = jax.random.PRNGKey(1)
    cstate = ctrl.init(key)
    pol0 = cstate.pol_mean

    # stage A: rollout + FK + cost + likelihood gradient
    def cost_sum(pol):
        c, _tr = ctrl._rollout_costs(q_start, pol, None)
        return jnp.sum(c)

    @jax.jit
    def stage_rollout(pol):
        g = jax.grad(cost_sum)(pol)
        return pol + 1e-6 * g, jnp.sum(g)

    t_roll = _timed_chain(stage_rollout, pol0, n_iters, x0_timed=pol0 + 1e-3)

    # stage B: signature Gram + adjoint on the tau projections
    _c, trajs = ctrl._rollout_costs(q_start, pol0, None)
    tau0 = ctrl._tau(trajs)

    @jax.jit
    def stage_gram(tau):
        k, dk = ctrl.sig_kernel.gram_and_grad(tau)
        return tau + 1e-6 * dk, jnp.sum(k)

    t_gram = _timed_chain(stage_gram, tau0, n_iters, x0_timed=tau0 + 1e-3)
    return {"rollout_cost_grad_ms": t_roll * 1e3, "sig_gram_adjoint_ms": t_gram * 1e3}


def bench_planning_iter(n_iters=6):
    """Steady-state seconds/iteration of the flagship open-loop planning
    workload — 1024 knot particles × [3 free knots, 7 dof], pathsig kernel at
    dyadic order 6 (``script_planning_robot.py:509-531`` scaled to the 1k
    particle count the r2 flagship sweep uses). Tracked per VERDICT r3 item
    7 so regressions in the planning pipeline are caught by the driver."""
    import jax
    import jax.numpy as jnp

    from sigsvgd_tpu.experiments.planning import (
        PlannerConfig, PlanningProblem, run_optimisation, sdf_occupancy,
    )
    from sigsvgd_tpu.inference import SVGD
    from sigsvgd_tpu.inference.score import pathsig_score
    from sigsvgd_tpu.kernels import SignatureKernel
    from sigsvgd_tpu.utils import schedulers

    robot = _STATE["robot"]
    scene_occ = sdf_occupancy(
        __import__("sigsvgd_tpu.models.robot", fromlist=["get_scene"]).get_scene(
            "bookshelf_small"
        )
    )
    problem = PlanningProblem(
        robot=robot,
        q_start=_STATE["q_start"],
        q_target=jnp.asarray([1.2, 0.6, -0.4, -1.2, 0.3, 1.8, 0.5]),
        occupancy_fn=scene_occ,
    )
    cfg = PlannerConfig(batch=1024)
    kernel = SignatureKernel(
        dyadic_order=cfg.depth, bandwidth=cfg.pathsig_bw,
        mxu_precision=cfg.mxu_precision,
    )
    score = pathsig_score(problem.batch_cost, kernel)
    lower, upper = robot.joint_limits()
    from sigsvgd_tpu.utils.math import smoothed_box_log_prob

    svgd = SVGD(
        lr=cfg.lr,
        log_prior=lambda x: smoothed_box_log_prob(x, lower, upper, 0.1).sum(-1),
        repulsion_schedule=schedulers.cosine(
            1.0, 0.0, 3 * cfg.n_iter // 4, cfg.n_iter // 4
        ),
    )
    key = jax.random.PRNGKey(2)
    x0 = jax.random.uniform(
        key, (cfg.batch, cfg.length - 2, robot.dof), minval=lower, maxval=upper
    )
    state0 = svgd.init(x0)

    @jax.jit
    def step(carry):
        x, st = carry
        x, st = svgd.step_update(x, st, score(x, key))
        return (x, st), jnp.sum(x)

    dt = _timed_chain(step, (x0, state0), n_iters,
                      x0_timed=(x0 + 1e-3, state0))
    return dt


# ---------------------------------------------------------------------------
# Torch-CPU baselines (the reference's execution model).
# ---------------------------------------------------------------------------


def bench_torch_cpu_policy(n_solves: int = 3) -> float:
    """Policy-RBF DuSt analog: torch CPU, Python horizon loop, per-op
    dispatch. Uses a joint-space quadratic cost (no FK) — generous to the
    baseline."""
    import torch

    torch.manual_seed(0)
    target = torch.ones(DOF) * 0.5
    pol = torch.empty(N_POL, HZ, DOF).uniform_(-2, 2)
    state = torch.zeros(DOF)
    adam_m = torch.zeros_like(pol)
    adam_v = torch.zeros_like(pol)
    step_count = 0

    def rollout_costs(p):
        states = state.expand(N_POL, DOF).clone()
        cost = torch.zeros(N_POL)
        for t in range(HZ):
            acts = p[:, t].clamp(-2, 2)
            states = (states + acts * 0.05).clamp(-3, 3)
            cost = cost + ((states - target) ** 2).sum(-1) + 0.01 * (acts**2).sum(-1)
        cost = cost + 10.0 * ((states - target) ** 2).sum(-1)
        return cost

    t0 = time.perf_counter()
    for _ in range(n_solves):
        for _ in range(OPT_STEPS):
            p = pol.detach().requires_grad_(True)
            cost = rollout_costs(p)
            log_lik = -(cost - cost.min().detach())
            (grad_lik,) = torch.autograd.grad(log_lik.sum(), p)
            x = pol.reshape(N_POL, -1)
            d2 = torch.cdist(x, x) ** 2
            h = (d2.median() / torch.log(torch.tensor(N_POL + 1.0))).sqrt().clamp_min(1e-8)
            k = torch.exp(-0.5 * d2 / h**2)
            dk = -torch.einsum("nm,nmd->nd", k, (x[:, None] - x[None]) / h**2)
            phi = (k @ (grad_lik.reshape(N_POL, -1)) - dk) / N_POL
            grad = -phi.reshape(pol.shape)
            step_count += 1
            adam_m.mul_(0.9).add_(grad, alpha=0.1)
            adam_v.mul_(0.999).addcmul_(grad, grad, value=0.001)
            m_hat = adam_m / (1 - 0.9**step_count)
            v_hat = adam_v / (1 - 0.999**step_count)
            pol = pol - 0.1 * m_hat / (v_hat.sqrt() + 1e-8)
        costs = rollout_costs(pol)
        a_seq = pol[costs.argmin()]
        state = (state + a_seq[0].clamp(-2, 2) * 0.05).clamp(-3, 3)
        pol = torch.roll(pol, -1, dims=1)
        pol[:, -1] = pol[:, -2]
    dt = time.perf_counter() - t0
    return n_solves / dt


def bench_torch_cpu_signature(n_small: int = 32, order: int = DYADIC) -> float:
    """Signature-kernel MPC solve time in the reference's execution model at
    ``n_small`` particles (fp64 PDE like the reference,
    ``_traj_kernels.py:205``) on a dyadic grid of the given ``order``.
    Returns seconds per MPC solve (OPT_STEPS SVGD steps) at ``n_small``
    particles; extrapolation to N_POL happens in
    :func:`bench_torch_cpu_signature_fit` from several measured sizes."""
    import torch

    torch.manual_seed(0)
    G = (HZ) * 2**order  # fine grid per pair (tau length H+1 → H cells)

    pol = torch.empty(n_small, HZ, DOF).uniform_(-1, 1)
    state = torch.zeros(DOF)

    def rollout(p):
        states = [state.expand(n_small, DOF)]
        for t in range(HZ):
            states.append((states[-1] + p[:, t].clamp(-2, 2) * 0.05).clamp(-3, 3))
        return torch.stack(states, dim=1)  # [n, H+1, DOF]

    def pde_gram(tau):
        # vectorized anti-diagonal fp64 Goursat solve over all pairs
        n = tau.shape[0]
        x = tau.double()
        d2 = ((x[:, None, :, None, :] - x[None, :, None, :, :]) ** 2).sum(-1)
        g = torch.exp(-d2 / SIG_BW)
        inc = (g[..., 1:, 1:] - g[..., 1:, :-1] - g[..., :-1, 1:] + g[..., :-1, :-1])
        z = (inc / 4.0**order).reshape(n * n, HZ, HZ)
        a = 1 + 0.5 * z + z * z / 12
        b = 1 - z * z / 12
        gx = G
        dm2 = torch.ones(n * n, gx + 1, dtype=torch.float64)
        dm1 = torch.ones(n * n, gx + 1, dtype=torch.float64)
        ii = torch.arange(gx + 1)
        for s in range(2, 2 * gx + 1):
            jj = s - ii
            interior = (ii >= 1) & (ii <= gx) & (jj >= 1) & (jj <= gx)
            ci = ((ii - 1).clamp(0, gx - 1) >> order).clamp(0, HZ - 1)
            cj = ((jj - 1).clamp(0, gx - 1) >> order).clamp(0, HZ - 1)
            new = (dm1 + torch.roll(dm1, 1, dims=1)) * a[:, ci, cj] - torch.roll(
                dm2, 1, dims=1
            ) * b[:, ci, cj]
            new = torch.where(interior[None], new, torch.ones_like(new))
            dm2, dm1 = dm1, new
        return dm1[:, gx].reshape(n, n).float()

    t0 = time.perf_counter()
    for _ in range(OPT_STEPS):
        p = pol.detach().requires_grad_(True)
        traj = rollout(p)
        tau = traj[:, :, :2]  # 41-point path -> 40x40 increment grid
        k = pde_gram(tau)
        grad_k = torch.autograd.grad(k.sum(), p, retain_graph=False)[0]
        costs = ((traj - 0.5) ** 2).sum((-2, -1))
        p2 = pol.detach().requires_grad_(True)
        c = ((rollout(p2) - 0.5) ** 2).sum((-2, -1))
        (grad_c,) = torch.autograd.grad(c.sum(), p2)
        phi = (k.detach() @ grad_c.reshape(n_small, -1) - grad_k.reshape(n_small, -1)) / n_small
        pol = pol - 0.1 * phi.reshape(pol.shape)
    return time.perf_counter() - t0


def bench_torch_cpu_signature_fit(sizes=(8, 16, 24, 32, 48, 64),
                                  order: int = DYADIC):
    """Measure the torch-CPU signature solve at several particle counts and
    fit ``log(dt) = a + e·log(pairs)`` (VERDICT r2 item 7: one measured point
    does not establish linearity; VERDICT r3 item 6: ≥5 points for a stable
    exponent). Each size takes the MIN over repeats (VERDICT r4 item 2c:
    single-shot points were visibly non-monotonic at adjacent sizes —
    CPU scheduling noise above the inter-size signal; min-of-N is the
    standard noise-floor estimator). Returns a dict with the measured
    points, the fitted pair-count exponent (with a per-point leave-one-out
    spread as the confidence band), and the solves/s extrapolated to N_POL
    from the largest measured point. fp64 PDE backward at n=128 needs
    ~100 GB of autograd storage, so 64 is the largest honestly measurable
    size on this host."""
    import math

    points = []
    raw_dts = []
    for n in sizes:
        # repeats scale down with cost: λ=3 at n≥48 runs minutes per shot
        reps = 3 if (order == 0 or n <= 32) else 2
        dts = [bench_torch_cpu_signature(n, order) for _ in range(reps)]
        dt = min(dts)
        raw_dts.append((n, dt))
        points.append(
            {"n_particles": n, "solve_s": round(dt, 3), "n_repeats": reps}
        )
        if dt > 300.0:  # don't let one more doubling eat the bench budget
            break

    def fit(samples):
        xs = [math.log(n * n) for n, _ in samples]
        ys = [math.log(dt) for _, dt in samples]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )

    # fit on the RAW durations (ADVICE r3: rounded values can hit log(0)),
    # and only when >= 2 points were measured; otherwise fall back to the
    # pair-count (exponent 1) extrapolation
    if len(raw_dts) >= 2:
        exponent = fit(raw_dts)
        loo = (
            [fit(raw_dts[:i] + raw_dts[i + 1 :]) for i in range(len(raw_dts))]
            if len(raw_dts) >= 3
            else [exponent]
        )
        exp_band = [round(min(loo), 3), round(max(loo), 3)]
    else:
        exponent, exp_band = 1.0, None
    n_last, dt_last = raw_dts[-1]
    dt_big = dt_last * ((N_POL * N_POL) / (n_last * n_last)) ** exponent
    return {
        "points": points,
        "pair_exponent": round(exponent, 3),
        "pair_exponent_loo_band": exp_band,
        "extrapolated_rate_at_n_pol": 1.0 / dt_big,
        "measured_rate_at_largest": 1.0 / dt_last,
        "largest_n": n_last,
    }


def _calibration_drift_check(n_steps: int = 8, tol: float = 1e-3):
    """Post-measurement recalibration monitor (ADVICE r4): the dyadic-order
    calibration is one-shot on warm-up paths, so after the measured MPC
    steps, re-evaluate the z³ truncation bound on the EVOLVED particles'
    τ paths and report whether the λ=0 choice still clears tolerance."""
    jax, jnp = _STATE["jax"], _STATE["jnp"]
    ctrl = _STATE["ctrl_sig"]
    if ctrl.sig_kernel.dyadic_order != 0:
        return None
    model, q_start = _STATE["model"], _STATE["q_start"]
    key = jax.random.PRNGKey(3)
    cs = ctrl.init(key)
    state = q_start
    fwd = jax.jit(
        lambda s, c, k: ctrl.forward(s, c, None, k, opt_steps=OPT_STEPS)
    )
    for k in jax.random.split(key, n_steps):
        a_seq, cs, _ = fwd(state, cs, k)
        state = model.step(state[None], a_seq[0:1])[0]
    _c, trs = ctrl._rollout_costs(state, cs.pol_mean, None)
    bound = float(ctrl.sig_kernel.calibration_bound(ctrl._tau(trs)))
    return {
        "z3_bound_after_steps": bound,
        "n_mpc_steps": n_steps,
        "tol": tol,
        "within_tolerance": bool(bound <= tol),
    }


def _run_parity_replay(timeout_s: int = 600):
    """Run the maze 20-step step-locked replay vs the imported torch
    reference (tests/test_reference_parity.py) in a CPU subprocess and
    return its MSE dict — BASELINE.json's primary metric is solves/s AND
    control MSE, so the round artifact must carry both (VERDICT r4 item 5).
    Returns None when the reference checkout or torch is unavailable."""
    import os
    import subprocess
    import tempfile

    out = os.path.join(tempfile.mkdtemp(prefix="sigsvgd_parity_"), "p.json")
    env = dict(os.environ, SIGSVGD_PARITY_OUT=out)
    try:
        r = subprocess.run(
            [
                "python", "-m", "pytest",
                "tests/test_reference_parity.py::"
                "test_closed_loop_maze_workload_parity",
                "-q", "-m", "slow or not slow",
            ],
            env=env, timeout=timeout_s, capture_output=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if r.returncode != 0 or not os.path.exists(out):
            return {"error": f"parity replay rc={r.returncode}"}
        with open(out) as f:
            return json.load(f)
    except Exception as e:  # pragma: no cover - environment-dependent
        return {"error": str(e)[:200]}


def main():
    _setup()
    # best-of-3 measurement rounds: the remote-dispatch tunnel occasionally
    # stalls a round ~10x, and the driver records a single bench run
    sig_runs = [bench_solver(_STATE["ctrl_sig"], n_iters=6) for _ in range(3)]
    sig_rate, sig_dt, sig_flops = max(sig_runs, key=lambda r: r[0])
    rbf_runs = [bench_solver(_STATE["ctrl_rbf"], n_iters=10) for _ in range(3)]
    rbf_rate, _rbf_dt, _ = max(rbf_runs, key=lambda r: r[0])
    stages = bench_stages()

    cal_order = _STATE["sig_kernel"].dyadic_order

    # CPU baselines at BOTH grid resolutions (VERDICT r4 item 2): every
    # ratio below compares solves of the SAME grid. The λ=3 fit is the
    # reference-as-configured baseline; the calibrated-order fit is the
    # same-resolution baseline for the headline (under the calibration's own
    # accuracy argument the CPU baseline is equally entitled to λ=0).
    try:
        cpu_sig3 = bench_torch_cpu_signature_fit(order=DYADIC)
    except Exception:
        cpu_sig3 = None
    if cal_order == DYADIC:
        cpu_sig_cal = cpu_sig3
    else:
        try:
            cpu_sig_cal = bench_torch_cpu_signature_fit(order=cal_order)
        except Exception:
            cpu_sig_cal = None
    try:
        cpu_rbf_rate = bench_torch_cpu_policy()
    except Exception:
        cpu_rbf_rate = None

    def _measured_scale(ctrl, cpu_fit, n_iters=10):
        """No-extrapolation ratio at the largest DIRECTLY measured CPU size,
        TPU and CPU solving the same grid. Guarded: a failure must not
        discard the expensive measurements above (ADVICE r3)."""
        if cpu_fit is None:
            return None
        try:
            ctrl_small = dataclasses.replace(ctrl, n_pol=cpu_fit["largest_n"])
            small_rate, _dt, _fl = max(
                (bench_solver(ctrl_small, n_iters=n_iters) for _ in range(2)),
                key=lambda r: r[0],
            )
            return {
                "n_particles": cpu_fit["largest_n"],
                "tpu_solves_per_s": round(small_rate, 2),
                "ratio": round(
                    small_rate / cpu_fit["measured_rate_at_largest"], 1
                ),
            }
        except Exception:
            return None

    vs_measured_scale = _measured_scale(_STATE["ctrl_sig"], cpu_sig_cal)
    vs_measured_scale_pinned = (
        None
        if cal_order == DYADIC
        else _measured_scale(_STATE["ctrl_sig_pinned"], cpu_sig3, n_iters=6)
    )

    try:
        plan_iter_s = bench_planning_iter()
    except Exception:
        plan_iter_s = None

    # transparency: the same solve with the dyadic order PINNED to the
    # reference config value (3) instead of the calibrated one
    pinned_rate = None
    if cal_order != DYADIC:
        try:
            pinned_rate, _dt, _fl = max(
                (
                    bench_solver(_STATE["ctrl_sig_pinned"], n_iters=4)
                    for _ in range(2)
                ),
                key=lambda r: r[0],
            )
        except Exception:
            pinned_rate = None

    # MC-action-samples variant (VERDICT r4 item 10): the reference maze
    # config runs n_action_samples=10 (particle_maze_config.yaml); time the
    # score-function path so the last hot-path variant is tracked
    try:
        ctrl_mc = dataclasses.replace(
            _STATE["ctrl_sig"], n_action_samples=10
        )
        mc_rate, _dt, _fl = bench_solver(ctrl_mc, n_iters=4)
    except Exception:
        mc_rate = None

    try:
        drift = _calibration_drift_check()
    except Exception:
        drift = None

    # control-parity artifact (VERDICT r4 item 5): run the step-locked maze
    # replay vs the imported torch reference in a CPU subprocess (tests must
    # not run over the TPU tunnel) and embed the MSE
    parity = _run_parity_replay()

    # utilization against the RIGHT roof (VERDICT r4 item 8): fraction of
    # the measured STRUCTURAL ceiling of the λ=3 band-sweep loop shape (the
    # kernel is VMEM-structure-bound, not FLOP-bound — raw FMA issue is
    # 0.4 cycles/op on this VPU). Regenerated by examples/vpu_ceiling.py;
    # mfu_vs_bf16_peak is kept only as the conventional (misleading) metric.
    vpu = None
    try:
        import os

        p = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "results", "vpu_ceiling_r5.json",
        )
        with open(p) as f:
            v = json.load(f)
        vpu = {
            "lambda3_fwd": round(v["vpu_issue_ceiling_fraction_fwd"], 3),
            "lambda3_bwd_vs_structural": round(
                v["vpu_issue_ceiling_fraction_bwd"], 3
            ),
            "lambda3_bwd_vs_arithmetic_bound": round(
                v["bwd_fraction_of_arithmetic_bound"], 3
            ),
            "source": "results/vpu_ceiling_r5.json (examples/vpu_ceiling.py)",
        }
    except Exception:
        vpu = None

    total_flops = (sig_flops or 0.0) + _pde_flops_per_solve(cal_order)
    mfu = total_flops * sig_rate / V5E_PEAK_FLOPS

    def _rate(fit):
        return fit["extrapolated_rate_at_n_pol"] if fit else None

    cpu_cal_rate, cpu3_rate = _rate(cpu_sig_cal), _rate(cpu_sig3)
    print(
        json.dumps(
            {
                "metric": "signature_mpc_solves_per_s_1chip_7dof_h40_1kpart",
                "value": round(sig_rate, 3),
                "unit": "solves/s",
                # SAME-RESOLUTION headline ratio: TPU at the calibrated order
                # vs the torch-CPU fp64 baseline solving the SAME grid
                "vs_baseline": (
                    round(sig_rate / cpu_cal_rate, 2) if cpu_cal_rate else None
                ),
                "baseline_method": (
                    "torch-cpu fp64 PDE at the SAME dyadic order as the TPU"
                    " solve, min-of-N repeats per size, extrapolated with the"
                    " fitted pair-count exponent; reference-as-configured"
                    " (dyadic 3) ratio reported separately"
                ),
                # reference-as-configured ratio: both sides pinned to λ=3
                "vs_baseline_reference_config_dyadic3": (
                    round(pinned_rate / cpu3_rate, 2)
                    if (pinned_rate and cpu3_rate)
                    else (
                        round(sig_rate / cpu3_rate, 2)
                        if (cal_order == DYADIC and cpu3_rate)
                        else None
                    )
                ),
                "baseline_points": cpu_sig_cal["points"] if cpu_sig_cal else None,
                "baseline_pair_exponent": (
                    cpu_sig_cal["pair_exponent"] if cpu_sig_cal else None
                ),
                "baseline_pair_exponent_loo_band": (
                    cpu_sig_cal["pair_exponent_loo_band"] if cpu_sig_cal else None
                ),
                "baseline_points_dyadic3": (
                    cpu_sig3["points"] if cpu_sig3 else None
                ),
                "baseline_pair_exponent_dyadic3": (
                    cpu_sig3["pair_exponent"] if cpu_sig3 else None
                ),
                "vs_baseline_measured_scale": vs_measured_scale,
                "vs_baseline_measured_scale_dyadic3": vs_measured_scale_pinned,
                "secondary_policy_rbf_solves_per_s": round(rbf_rate, 2),
                "secondary_vs_torch_cpu": (
                    round(rbf_rate / cpu_rbf_rate, 2) if cpu_rbf_rate else None
                ),
                "solves_per_s_mc_action_samples_10": (
                    round(mc_rate, 3) if mc_rate else None
                ),
                "stages_ms": {k: round(v, 2) for k, v in stages.items()},
                "sig_dyadic_order_calibrated": cal_order,
                "calibration_drift_check": drift,
                "solves_per_s_dyadic3_pinned": (
                    round(pinned_rate, 3) if pinned_rate else None
                ),
                "planning_s_per_iter_1kpart_depth6": (
                    round(plan_iter_s, 4) if plan_iter_s else None
                ),
                "control_parity": parity,
                "vpu_structural_ceiling_fraction": vpu,
                "flops_per_solve": total_flops,
                "mfu_vs_bf16_peak": round(mfu, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
