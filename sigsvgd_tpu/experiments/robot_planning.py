"""Flagship experiment driver: Panda arm planning over scenes × requests ×
seeds × methods.

Counterpart of reference ``examples/script_planning_robot.py:482-631``. The
reference fans whole experiments out over GPUs with ``mp.Pool``; here each
optimization run is one jitted program, and *within-run* parallelism (the
particle batch) is the unit that shards across TPU chips (see
``sigsvgd_tpu.parallel``).

Run: ``python -m sigsvgd_tpu.experiments.robot_planning --scenes pillars_4 \
      --methods pathsig svgd sgd --seeds 2 --quick``
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.learning.mlp import ProbModel, train_prob_model
from ..models.robot.panda import PandaRobot
from ..models.robot.scene import (
    PathRequest,
    SCENE_TAGS,
    get_scene,
    sample_occupancy_dataset,
)
from ..models.robot.self_collision import (
    sample_self_collision_dataset,
    self_collision,
)
from ..utils.helper import enable_compile_cache, generate_seeds, save_progress
from .planning import (
    PlannerConfig,
    PlanningProblem,
    evaluate_trajectory,
    run_optimisation,
    sdf_occupancy,
)
from .verify_trajectory import verify_knot_trajectories


def default_requests(robot: PandaRobot, scene_tag: str, n: int = 4) -> List[PathRequest]:
    """Deterministic per-scene start/goal pairs: random configurations that
    are free of BOTH self-collision and scene collision (replaces the
    reference's downloaded MoveIt request YAMLs; a request whose endpoints sit
    inside an obstacle is unsolvable by construction).

    Round-4 hardening (the round-2 vs round-4 sweep forensics,
    ``results/flagship_r4/summary.md``): (a) endpoints need ≥ 0.10 m scene
    clearance — the old 0.05 m admitted endpoints inside the learned
    occupancy model's uncertainty band (exact-collision-free trajectories
    scoring occ ≥ 0.95 under the reference's 0.2-threshold success
    criterion), and (b) candidates are paired POSITIONALLY (pair j =
    candidates 2j, 2j+1, accepted only if both are free) instead of by
    compacting the free list — compaction re-pairs EVERY downstream request
    when one borderline candidate flips across fp-level toolchain changes,
    which is what broke round-2 comparability.
    """
    from ..models.robot.scene import get_scene, scene_sdf
    from .planning import create_body_points

    # deterministic per-scene seed (stable across processes, unlike hash())
    seed = int.from_bytes(scene_tag.encode()[:4].ljust(4, b"_"), "little")
    rng = np.random.default_rng(seed)
    scene = get_scene(scene_tag)
    lower, upper = (np.asarray(a) for a in robot.joint_limits())
    # batch-label all candidates in two device calls (per-candidate float()
    # checks cost a sync round-trip each)
    cands = rng.uniform(lower * 0.7, upper * 0.7, size=(800, 7))
    self_hit = np.asarray(self_collision(robot, jnp.asarray(cands)))
    body = create_body_points(robot.qs_to_joints_xs(jnp.asarray(cands)), 5)
    env_clearance = np.asarray(scene_sdf(scene, body).min(axis=-1))
    ok = (self_hit == 0.0) & (env_clearance > 0.10)
    reqs = []
    for j in range(len(cands) // 2):
        a, b = 2 * j, 2 * j + 1
        if ok[a] and ok[b]:
            reqs.append(
                PathRequest(tuple(map(float, cands[a])), tuple(map(float, cands[b])))
            )
        if len(reqs) == n:
            break
    return reqs


def build_problem(
    robot: PandaRobot,
    scene_tag: str,
    req: PathRequest,
    use_learned: bool,
    occmap: Optional[ProbModel],
    self_pred: Optional[ProbModel],
    timesteps: int,
) -> PlanningProblem:
    scene = get_scene(scene_tag)
    if use_learned and occmap is not None:
        occupancy_fn = lambda x: occmap(x)[..., 0]  # noqa: E731
    else:
        occupancy_fn = sdf_occupancy(scene)
    self_fn = (lambda qs: self_pred(qs)[..., 0]) if self_pred is not None else None
    return PlanningProblem(
        robot=robot,
        q_start=jnp.asarray(req.start),
        q_target=jnp.asarray(req.target),
        occupancy_fn=occupancy_fn,
        self_collision_fn=self_fn,
        timesteps=timesteps,
    )


OCC_TRAIN_MARGIN = 0.03  # labels count sdf <= margin as occupied (train AND eval)


def train_scene_models(
    robot: PandaRobot, scene_tag: str, n_samples: int = 200_000, epochs: int = 15
):
    """Train the occupancy MLP for a scene and the shared self-collision
    predictor (the reference ships pre-trained weights in robodata; we train
    from the exact oracles)."""
    scene = get_scene(scene_tag)
    key = jax.random.PRNGKey(0)
    pts, labels = sample_occupancy_dataset(scene, key, n_samples, margin=OCC_TRAIN_MARGIN)
    occmap = train_prob_model(
        jax.random.PRNGKey(1), pts, labels, epochs=epochs, log_every=0
    )
    qs, qlabels = sample_self_collision_dataset(robot, jax.random.PRNGKey(2), n_samples)
    self_pred = train_prob_model(
        jax.random.PRNGKey(3), qs, qlabels, epochs=epochs, log_every=0
    )
    return occmap, self_pred


def run_experiment(
    scene_tags: List[str],
    methods: List[str],
    n_seeds: int,
    out_dir: Optional[Path],
    config: PlannerConfig,
    use_learned: bool = False,
    n_requests: int = 2,
) -> List[Dict]:
    robot = PandaRobot.create()
    seeds = generate_seeds(n_seeds)
    results = []
    for tag in scene_tags:
        scene = get_scene(tag)
        occmap = self_pred = None
        if use_learned:
            occmap, self_pred = train_scene_models(robot, tag)
        for req_i, req in enumerate(default_requests(robot, tag, n=n_requests)):
            for seed in seeds:
                for method in methods:
                    if out_dir is not None and (
                        out_dir / f"robot-{tag}/{req_i}-{seed}/{method}" / "data.pkl"
                    ).exists():
                        # idempotent re-runs skip finished cells (parity:
                        # script_planning_robot.py:556-557)
                        continue
                    cfg = dataclasses.replace(config, method=method)
                    problem = build_problem(
                        robot, tag, req, use_learned, occmap, self_pred, cfg.timesteps
                    )
                    key = jax.random.PRNGKey(seed)
                    t0 = time.perf_counter()
                    x_final, _ = run_optimisation(problem, cfg, key)
                    jax.block_until_ready(x_final)
                    wall = time.perf_counter() - t0
                    metrics = evaluate_trajectory(problem, x_final)
                    audit = verify_knot_trajectories(
                        robot, scene, problem.q_start, problem.q_target, x_final,
                        timesteps=cfg.timesteps,
                    )
                    row = {
                        "scene": tag,
                        "request": req_i,
                        "seed": seed,
                        "method": method,
                        "success_rate": float(np.asarray(metrics["success"]).mean()),
                        "n_collision_free": audit["n_valid"],
                        "best_ee_length": float(
                            np.asarray(metrics["ee_path_length"]).min()
                        ),
                        "wall_clock_s": round(wall, 2),
                    }
                    results.append(row)
                    print(json.dumps(row))
                    if out_dir:
                        save_progress(
                            out_dir / f"robot-{tag}/{req_i}-{seed}/{method}",
                            data={
                                "knots": np.asarray(x_final),
                                "metrics": {
                                    k: np.asarray(v) for k, v in metrics.items()
                                },
                                "audit": audit,
                            },
                            config=dataclasses.asdict(cfg),
                        )
    return results


def main():
    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--scenes", nargs="+", default=["pillars_4"],
                        choices=list(SCENE_TAGS))
    parser.add_argument("--methods", nargs="+", default=["pathsig", "svgd", "sgd"])
    parser.add_argument("--seeds", type=int, default=1)
    parser.add_argument("--out", type=Path, default=None)
    parser.add_argument("--use-learned", action="store_true",
                        help="train + use learned occupancy/self-collision MLPs")
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--requests", type=int, default=2,
                        help="path requests per scene (reference scale: 4)")
    args = parser.parse_args()

    config = PlannerConfig()
    if args.quick:
        config = PlannerConfig(n_iter=60, batch=8, depth=3, timesteps=60)
    run_experiment(
        args.scenes, args.methods, args.seeds, args.out, config,
        args.use_learned, n_requests=args.requests,
    )


if __name__ == "__main__":
    main()
