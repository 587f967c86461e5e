"""Closed-loop Stein-MPC on the 2-D particle maze.

Counterpart of reference ``examples/script_control_particle_maze.py``: a
DuSt controller (RBF "svmpc" or signature-kernel "pathsig") drives a point
mass through an obstacle grid, optionally running MPF dynamics inference on
the particle's mass after every real step. The per-step MPC solve is one
jitted call; the episode loop stays in Python only for early termination.

Run: ``python -m sigsvgd_tpu.experiments.maze --kernel signature --steps 300``
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..controllers import DuSt
from ..inference import MPF, GaussianLikelihood
from ..kernels import GaussianKernel, ScaledGaussianKernel, SignatureKernel
from ..models import ParticleModel
from ..utils import distributions as du
from ..utils.helper import enable_compile_cache, generate_seeds, save_progress


@dataclasses.dataclass(frozen=True)
class MazeConfig:
    """Defaults = reference ``examples/particle_maze_config.yaml``."""

    steps: int = 300
    horizon: int = 30
    n_policies: int = 30
    action_samples: int = 10
    params_samples: int = 0
    alpha: float = 1.0
    learning_rate: float = 1.0
    ctrl_sigma: float = 5.0
    opt_steps: int = 2
    kernel: str = "signature"  # rbf | rbf_fixed_bw | signature
    dyadic_order: int = 3
    use_mpf: bool = False
    mpf_n_particles: int = 50
    mpf_steps: int = 20
    mpf_log_space: bool = True
    mpf_learning_rate: float = 0.01
    mpf_bandwidth: float = 0.5
    mpf_obs_std: float = 0.1
    # >0: run the MPF observe-update sharded over a 1-D 'dp' mesh of this
    # many devices (parallel.mpf.sharded_mpf_observe); mpf_n_particles must
    # divide it. 0 = single-device MPF.
    mpf_mesh_devices: int = 0
    dyn_prior_mean: float = 2.0
    dyn_prior_std: float = 0.1
    dt: float = 0.015
    warm_up: int = 0
    # periodic checkpoint/resume (utils.checkpoint): save the full MPC state
    # every N steps; an episode restarted with the same checkpoint_dir
    # resumes from the newest checkpoint
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 0
    # stream per-step cost (and the MPF posterior mean when active) to this
    # PNG while the episode runs (utils.live_plot.LiveFigure; reference
    # analog: updatable_mpl.UpdatableSequentialPlot)
    live_plot: Optional[str] = None


def make_model(cfg: MazeConfig) -> ParticleModel:
    return ParticleModel.create(
        dt=cfg.dt,
        control_type="acceleration",
        max_speed=5.0,
        with_obstacle=True,
        obst_preset="sm_grid_4x4",
        obst_width=0.6,
        map_size=(4, 4),
        map_cell_size=0.01,
        # NOTE: the reference config starts at (-1.8, -1.8)
        # (particle_maze_config.yaml:14) which lies exactly on the corner
        # obstacle's extent (center -1.5, half-width 0.305) — the particle
        # "crashes" at step 0. We start just inside the free corridor.
        init_state=(-1.85, -1.85, 0.0, 0.0),
        target_state=(1.85, 1.85, 0.0, 0.0),
        can_crash=True,
        deterministic=True,
        cost_params={
            "w_qpos": 0.5,
            "w_qvel": 0.25,
            "w_ctrl": 0.2,
            "w_obs": 1.0e6,
            "w_qpos_T": 1.0e3,
            "w_qvel_T": 0.1,
        },
        uncertain_params=("mass",),
    )


def action_primitives(horizon: int) -> jnp.ndarray:
    """The reference's 5 hand-coded primitives
    (``script_control_particle_maze.py:197-201``)."""
    prims = jnp.zeros((5, horizon, 2))
    prims = prims.at[1].set(-10.0)
    prims = prims.at[2].set(10.0)
    prims = prims.at[3].set(jnp.asarray([-10.0, 10.0]))
    prims = prims.at[4].set(jnp.asarray([10.0, -10.0]))
    return prims


def build_controller(cfg: MazeConfig, model: ParticleModel) -> DuSt:
    fixed_bw = (2 + cfg.horizon) ** 0.5
    if cfg.kernel == "rbf":
        kernel_mode, kernel = "policy", ScaledGaussianKernel()
    elif cfg.kernel == "rbf_fixed_bw":
        kernel_mode = "policy"
        kernel = ScaledGaussianKernel(bandwidth_fn=lambda _: fixed_bw)
    elif cfg.kernel == "signature":
        kernel_mode, kernel = "signature", ScaledGaussianKernel()
    else:
        raise ValueError(f"invalid kernel: {cfg.kernel}")
    return DuSt(
        model=model,
        hz_len=cfg.horizon,
        n_pol=cfg.n_policies,
        n_prim=5,
        n_action_samples=cfg.action_samples,
        n_params_samples=cfg.params_samples,
        pol_cov=tuple(map(tuple, (np.eye(2) * cfg.ctrl_sigma**2).tolist())),
        temperature=cfg.alpha,
        params_log_space=cfg.mpf_log_space,
        kernel_mode=kernel_mode,
        kernel=kernel,
        sig_kernel=SignatureKernel(dyadic_order=cfg.dyadic_order, bandwidth=fixed_bw),
        optimizer=optax.adam(cfg.learning_rate),
        inst_cost_fn=model.default_inst_cost,
        term_cost_fn=model.default_term_cost,
    )


def run_episode(
    cfg: MazeConfig, seed: int, verbose: bool = False
) -> Dict[str, Any]:
    """One closed-loop episode; returns trajectory/cost/action arrays
    (parity: ``run_exp``, ``script_control_particle_maze.py:18-153``)."""
    model = make_model(cfg)
    system = model  # simulator == system (deterministic config)
    ctrl = build_controller(cfg, model)
    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    cstate = ctrl.init(k_init, action_primitives=cfg.horizon and action_primitives(cfg.horizon))

    dyn_prior = du.Gaussian(
        mean=jnp.asarray([cfg.dyn_prior_mean]),
        cov=jnp.asarray([cfg.dyn_prior_std**2]),
    )

    mpf = None
    mpf_state = None
    state = jnp.asarray(model.init_state)
    if cfg.use_mpf:
        lik = GaussianLikelihood(
            step_fn=model.step,
            params_to_dict=model.params_to_dict,
            obs_std=cfg.mpf_obs_std,
            log_space=cfg.mpf_log_space,
        )
        mpf = MPF(
            likelihood=lik,
            kernel=GaussianKernel(),
            lr=cfg.mpf_learning_rate,
            bw=cfg.mpf_bandwidth,
        )
        key, k_mpf = jax.random.split(key)
        init_particles = jnp.clip(
            du.sample(dyn_prior, k_mpf, (cfg.mpf_n_particles,)), 1e-6, None
        )
        if cfg.mpf_log_space:
            init_particles = jnp.log(init_particles)
        mpf_state = mpf.init(init_particles, state)

    from ..utils.obstacle_map import get_collisions

    @jax.jit
    def mpc_step(state, cstate, params_dist, key):
        a_seq, cstate, data = ctrl.forward(
            state, cstate, params_dist, key, opt_steps=cfg.opt_steps
        )
        action = a_seq[0]
        nxt = system.step(state[None], action[None])[0]
        # episode-termination flags computed on-device: the host fetches one
        # packed tuple per step instead of paying a round-trip per check
        inst_cost = model.default_inst_cost(nxt[None])[0]
        crashed = get_collisions(model.obstacle_map, nxt[:2]) > 0
        reached = jnp.linalg.norm(model.target - nxt) <= 1.0
        return action, nxt, cstate, data, inst_cost, crashed, reached

    if mpf and cfg.mpf_mesh_devices > 0:
        # online dynamics inference over the mesh: the same observe-update,
        # particles sharded over 'dp' (ref mpf.py:64-86 semantics preserved
        # to fp tolerance — tests/test_parallel_mpf.py)
        from ..parallel.mesh import make_mesh
        from ..parallel.mpf import sharded_mpf_observe

        mpf_mesh = make_mesh(
            [cfg.mpf_mesh_devices], ("dp",),
            devices=jax.devices()[: cfg.mpf_mesh_devices],
        )
        mpf_observe = jax.jit(
            lambda st, a, obs: sharded_mpf_observe(
                mpf, st, a, obs, mpf_mesh, n_steps=cfg.mpf_steps
            )
        )
    elif mpf:
        mpf_observe = jax.jit(
            lambda st, a, obs: mpf.observe(st, a, obs, n_steps=cfg.mpf_steps)
        )
    else:
        mpf_observe = None

    states, actions, costs, dyn_particles = [np.asarray(state)], [], [], []
    reached_goal = False
    # precompute step keys: host-side key splitting inside the loop costs a
    # device round-trip per step
    step_keys = jax.random.split(key, cfg.steps)

    # -- checkpoint/resume (reference analog: save_progress + idempotent
    # output dirs; here the full controller/filter state round-trips) -------
    start_step = 0
    if cfg.checkpoint_dir:
        from ..utils import checkpoint as ckpt

        latest = ckpt.latest_checkpoint(cfg.checkpoint_dir)
        if latest is not None:
            template = {
                "state": state,
                "cstate": cstate,
                "mpf_state": mpf_state if mpf else jnp.zeros(()),
            }
            restored = ckpt.restore_checkpoint(latest, template)
            state = restored["state"]
            cstate = restored["cstate"]
            if mpf:
                mpf_state = restored["mpf_state"]
            start_step = int(latest.name.split("_")[1])
            hist = np.load(Path(latest) / "history.npz", allow_pickle=True)
            states = list(hist["states"])
            actions = list(hist["actions"])
            costs = list(hist["costs"])
            if hist["dyn_particles"].size:
                dyn_particles = list(hist["dyn_particles"])

    def _save_ckpt(step):
        from ..utils import checkpoint as ckpt

        path = Path(cfg.checkpoint_dir) / f"step_{step}"
        ckpt.save_checkpoint(
            path,
            {
                "state": state,
                "cstate": cstate,
                "mpf_state": mpf_state if mpf else jnp.zeros(()),
            },
        )
        np.savez(
            Path(path) / "history.npz",
            states=np.stack(states),
            actions=np.stack(actions) if actions else np.zeros((0, 2)),
            costs=np.asarray(costs),
            dyn_particles=(
                np.stack(dyn_particles) if dyn_particles else np.zeros(0)
            ),
        )

    live = None
    if cfg.live_plot:
        from ..utils.live_plot import LiveFigure

        live = LiveFigure(
            nrows=2 if mpf else 1, out_path=cfg.live_plot, redraw_every=10
        )

    t0 = time.perf_counter()
    for step in range(start_step, cfg.steps):
        sub = step_keys[step]
        params_dist = (
            du.ParticleGMM(
                means=mpf_state.particles,
                var=mpf_state.prior_bw**2,
                weights=jnp.ones((cfg.mpf_n_particles,)),
            )
            if mpf
            else dyn_prior
        )
        action, state, cstate, data, inst_cost, crashed, reached = mpc_step(
            state, cstate, params_dist, sub
        )
        if mpf and step >= cfg.warm_up:
            mpf_state, _ = mpf_observe(mpf_state, action, state)
        # single host transfer per step (mpf particles folded in when active)
        fetch = (action, state, inst_cost, crashed, reached) + (
            (mpf_state.particles,) if mpf else ()
        )
        fetched = jax.device_get(fetch)
        action_h, state_h, cost_h, crashed_h, reached_h = fetched[:5]
        if mpf and step >= cfg.warm_up:
            dyn_particles.append(fetched[5])
        states.append(state_h)
        actions.append(action_h)
        costs.append(float(cost_h))
        if live:
            live.append("inst_cost", cost_h)
            if mpf and step >= cfg.warm_up:
                mean = np.mean(fetched[5])
                live.append(
                    "mass posterior mean",
                    np.exp(mean) if cfg.mpf_log_space else mean,
                    panel=1,
                )
        reached_goal = bool(reached_h)
        if crashed_h:
            if verbose:
                print(f"Crashed at step {step}")
            break
        if reached_goal:
            if verbose:
                print(f"Reached goal at step {step}")
            break
        if (
            cfg.checkpoint_dir
            and cfg.checkpoint_every
            and (step + 1) % cfg.checkpoint_every == 0
        ):
            _save_ckpt(step + 1)
    wall = time.perf_counter() - t0
    if live:
        live.redraw()
        live.close()

    return {
        "trajectory": np.stack(states),
        "actions": np.stack(actions) if actions else np.zeros((0, 2)),
        "costs": np.asarray(costs),
        "dyn_particles": np.stack(dyn_particles) if dyn_particles else None,
        "steps": len(actions),
        "wall_clock_s": wall,
        "reached_goal": reached_goal,
    }


def main():
    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--kernel", default="signature",
                        choices=["rbf", "rbf_fixed_bw", "signature"])
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--episodes", type=int, default=1)
    parser.add_argument("--use-mpf", action="store_true")
    parser.add_argument("--mpf-mesh-devices", type=int, default=0,
                        help="shard the MPF observe-update over a 'dp' mesh "
                        "of this many devices (0 = single device)")
    parser.add_argument("--out", default=None)
    parser.add_argument("--live-plot", default=None, metavar="PNG",
                        help="stream per-step cost curves to this PNG")
    args = parser.parse_args()

    cfg = MazeConfig(
        kernel=args.kernel, steps=args.steps, use_mpf=args.use_mpf,
        mpf_mesh_devices=args.mpf_mesh_devices, live_plot=args.live_plot,
    )
    for ep, seed in enumerate(generate_seeds(args.episodes)):
        result = run_episode(cfg, seed, verbose=True)
        summary = {
            "episode": ep,
            "seed": seed,
            "steps": result["steps"],
            "total_cost": float(result["costs"].sum()),
            "reached_goal": bool(result["reached_goal"]),
            "wall_clock_s": round(result["wall_clock_s"], 2),
        }
        print(json.dumps(summary))
        if args.out:
            save_progress(
                f"{args.out}/ep{ep}", data=result, config=dataclasses.asdict(cfg)
            )


if __name__ == "__main__":
    main()
