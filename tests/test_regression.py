"""Golden-trajectory regression tests.

The reference's control sequences cannot be replayed in this image (its torch
extension stack is not installed), so these goldens pin OUR closed-loop
behavior across refactors instead (SURVEY.md §4 point (d) adapted): a short
maze episode with a fixed seed must reproduce the recorded CPU trajectory
within tolerance. Regenerate the constants deliberately when an intentional
behavior change lands (run the episode and paste the new array).
"""
import numpy as np

from sigsvgd_tpu.experiments.maze import MazeConfig, run_episode

GOLDEN_MAZE_RBF_SEED42 = np.array(
    [
        [-1.85, -1.85, 0.0, 0.0],
        [-1.85, -1.85, 0.040952, 0.084326],
        [-1.849386, -1.848735, 0.088978, 0.08399],
        [-1.848051, -1.847475, 0.129182, 0.170483],
        [-1.846113, -1.844918, 0.018906, 0.247065],
        [-1.84583, -1.841212, 0.018906, 0.247065],
    ],
    dtype=np.float32,
)


def test_maze_rbf_golden_trajectory():
    res = run_episode(MazeConfig(kernel="rbf", steps=5), seed=42)
    np.testing.assert_allclose(
        res["trajectory"], GOLDEN_MAZE_RBF_SEED42, rtol=1e-4, atol=1e-5
    )


def test_maze_deterministic_across_runs():
    a = run_episode(MazeConfig(kernel="rbf", steps=4), seed=11)
    b = run_episode(MazeConfig(kernel="rbf", steps=4), seed=11)
    np.testing.assert_array_equal(a["trajectory"], b["trajectory"])
    c = run_episode(MazeConfig(kernel="rbf", steps=4), seed=12)
    assert not np.allclose(a["trajectory"], c["trajectory"])
