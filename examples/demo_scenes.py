"""Demo: built-in scenes, their SDFs, and occupancy-MLP training.

Counterpart of reference ``examples/demo_robot_visualise_scenes.py`` /
``demo_robot_visualise_dataset.py``. Run: ``python examples/demo_scenes.py``.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from sigsvgd_tpu.models.robot.scene import (  # noqa: E402
    SCENE_TAGS,
    get_scene,
    sample_occupancy_dataset,
)
from sigsvgd_tpu.utils.plots import plot_arm_trajectories  # noqa: E402


def main():
    for tag in SCENE_TAGS:
        scene = get_scene(tag)
        pts, labels = sample_occupancy_dataset(scene, jax.random.PRNGKey(0), 20000)
        occ = pts[labels > 0.5]
        print(f"{tag}: {len(scene.primitives)} primitives, "
              f"occupied fraction {labels.mean():.3f}")
        if tag == "cage":
            plot_arm_trajectories(
                np.zeros((1, 3)), scene_points=occ, path="data/demo_scene_cage.png"
            )
    print("wrote data/demo_scene_cage.png")


if __name__ == "__main__":
    main()
