"""Demo: interactive standalone-HTML 3-D viewer of a Panda trajectory.

Counterpart of the reference's plotly visual demos
(``examples/demo_robot_visualise_*``, rendering via
``src/models/robot/robot_visualizer.py:10-76``) and the scene ``play``
animation (``robot_scene.py:387-411``). Writes ``viewer_demo.html`` — open it
in any browser; drag to orbit, wheel to zoom, play/slider to animate the arm.

Run: ``python examples/demo_interactive_viewer.py [scene_tag]``.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from sigsvgd_tpu.models.robot import PandaRobot, get_scene  # noqa: E402
from sigsvgd_tpu.utils.viewer import export_interactive_html  # noqa: E402


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "bookshelf_small"
    robot = PandaRobot.create()
    scene = get_scene(tag)

    q_home = jnp.asarray([0.0, -0.785, 0.0, -2.356, 0.0, 1.571, 0.785])
    q_goal = jnp.asarray([1.2, 0.6, -0.4, -1.2, 0.3, 1.8, 0.5])
    qs = jnp.linspace(q_home, q_goal, 40)
    frames = np.asarray(robot.qs_to_joints_xs(qs))  # [T, n_links, 3]

    out = export_interactive_html(
        Path(__file__).parent / "viewer_demo.html",
        scene=scene,
        arm_frames=frames,
        ee_trajectories=frames[None, :, -1, :],
        title=f"Panda @ {tag}",
    )
    print(f"wrote {out} — open in a browser")


if __name__ == "__main__":
    main()
