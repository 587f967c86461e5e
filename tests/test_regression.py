"""Golden-trajectory regression tests.

The reference's control sequences cannot be replayed in this image (its torch
extension stack is not installed), so these goldens pin OUR closed-loop
behavior across refactors instead (SURVEY.md §4 point (d) adapted): a short
maze episode with a fixed seed must reproduce the recorded CPU trajectory
within tolerance. Regenerate the constants deliberately when an intentional
behavior change lands (run the episode and paste the new array).
"""
import numpy as np
import pytest

from sigsvgd_tpu.experiments.maze import MazeConfig, run_episode

# re-recorded for round 2: bw_median/bw_silverman/obstacle-map rasterization
# were aligned bit-for-bit with the torch reference (test_reference_parity.py),
# which legitimately shifts the closed-loop trajectory
GOLDEN_MAZE_RBF_SEED42 = np.array(
    [
        [-1.85, -1.85, 0.0, 0.0],
        [-1.85, -1.85, 0.124168, 0.082583],
        [-1.848137, -1.848761, 0.253787, 0.061442],
        [-1.844331, -1.84784, 0.367589, 0.188],
        [-1.838817, -1.84502, 0.492842, 0.18478],
        [-1.831424, -1.842248, 0.525992, 0.21225],
    ],
    dtype=np.float32,
)


def test_maze_rbf_golden_trajectory():
    res = run_episode(MazeConfig(kernel="rbf", steps=5), seed=42)
    np.testing.assert_allclose(
        res["trajectory"], GOLDEN_MAZE_RBF_SEED42, rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
def test_maze_deterministic_across_runs():
    a = run_episode(MazeConfig(kernel="rbf", steps=4), seed=11)
    b = run_episode(MazeConfig(kernel="rbf", steps=4), seed=11)
    np.testing.assert_array_equal(a["trajectory"], b["trajectory"])
    c = run_episode(MazeConfig(kernel="rbf", steps=4), seed=12)
    assert not np.allclose(a["trajectory"], c["trajectory"])
