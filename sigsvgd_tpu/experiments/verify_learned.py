"""Accuracy audit of the learned collision models vs the exact oracles.

Counterpart of reference ``examples/script_robot_verify_learned_model.py``
(visual check of occmap/self-collision MLPs against pybullet): here the check
is quantitative — classification metrics of the occupancy MLP against the
exact scene SDF and of the self-collision predictor against the capsule
oracle, on held-out samples.
"""
from __future__ import annotations

import json
from typing import Dict

import jax
import numpy as np

from ..models.learning.mlp import ProbModel
from ..models.robot.panda import PandaRobot
from ..models.robot.scene import Scene, sample_occupancy_dataset
from ..models.robot.self_collision import sample_self_collision_dataset


def _metrics(pred: np.ndarray, label: np.ndarray, threshold: float = 0.5) -> Dict:
    """Note: models are trained with inverse-frequency pos_weight, which
    shifts the sigmoid operating point toward recall — metrics are reported
    at several thresholds plus a threshold-free AUC."""
    hard = (pred >= threshold).astype(np.float32)
    tp = float(((hard == 1) & (label == 1)).sum())
    fp = float(((hard == 1) & (label == 0)).sum())
    fn = float(((hard == 0) & (label == 1)).sum())
    tn = float(((hard == 0) & (label == 0)).sum())
    # threshold-free ranking quality (AUC via the rank-sum identity)
    order = np.argsort(pred)
    ranks = np.empty(len(pred))
    ranks[order] = np.arange(1, len(pred) + 1)
    n_pos = max(label.sum(), 1)
    n_neg = max((1 - label).sum(), 1)
    auc = (ranks[label == 1].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    return {
        "accuracy": (tp + tn) / max(len(label), 1),
        "precision": tp / max(tp + fp, 1),
        "recall": tp / max(tp + fn, 1),
        "auc": float(auc),
        "positive_rate": float(label.mean()),
        "threshold": threshold,
    }


def verify_occupancy_model(
    model: ProbModel, scene: Scene, n: int = 50_000, seed: int = 123
) -> Dict:
    from .robot_planning import OCC_TRAIN_MARGIN

    # evaluate against the same margin the model was trained on — otherwise
    # the 0 < sdf <= margin band counts correct predictions as false positives
    pts, labels = sample_occupancy_dataset(
        scene, jax.random.PRNGKey(seed), n, margin=OCC_TRAIN_MARGIN
    )
    pred = np.asarray(model(pts))[:, 0]
    return _metrics(pred, labels)


def verify_self_collision_model(
    model: ProbModel, robot: PandaRobot, n: int = 50_000, seed: int = 123
) -> Dict:
    qs, labels = sample_self_collision_dataset(robot, jax.random.PRNGKey(seed), n)
    pred = np.asarray(model(qs))[:, 0]
    return _metrics(pred, labels)


def main():
    import argparse

    from ..models.robot.scene import get_scene
    from .robot_planning import train_scene_models

    parser = argparse.ArgumentParser()
    parser.add_argument("--scene", default="table_pick")
    parser.add_argument("--samples", type=int, default=100_000)
    args = parser.parse_args()

    robot = PandaRobot.create()
    scene = get_scene(args.scene)
    occmap, self_pred = train_scene_models(robot, args.scene, n_samples=args.samples)
    print(json.dumps({
        "occupancy": verify_occupancy_model(occmap, scene),
        "self_collision": verify_self_collision_model(self_pred, robot),
    }, indent=2))


if __name__ == "__main__":
    main()
