"""Checkpoint/resume for long experiments (orbax-backed).

Counterpart of the reference's ad-hoc persistence (torch.save data_dicts,
PL ``.ckpt`` files, dill sessions — SURVEY.md §5.4): any pytree (controller
state, SVGD/optimizer state, particles, MLP params) round-trips through an
orbax ``PyTreeCheckpointer``. Wired into the experiment loops: the maze MPC
episode saves its full controller/filter state every
``MazeConfig.checkpoint_every`` steps and resumes from the newest checkpoint
on restart (``experiments/maze.py::run_episode``; resume equivalence is
asserted in ``tests/test_experiments.py::test_maze_checkpoint_resume``), and
``experiments/planning.py::run_optimisation(checkpoint_dir=...)`` does the
same per-N-iterations for arm trajectory optimization.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import orbax.checkpoint as ocp


def save_checkpoint(path: str | Path, state: Any, force: bool = True) -> None:
    path = Path(path).resolve()
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, state, force=force)


def restore_checkpoint(path: str | Path, template: Optional[Any] = None) -> Any:
    """Restore a pytree; with ``template``, leaves adopt its structure/dtypes."""
    path = Path(path).resolve()
    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        return ckptr.restore(path, item=template)
    return ckptr.restore(path)


def latest_checkpoint(root: str | Path) -> Optional[Path]:
    """Newest checkpoint directory under ``root`` (named ``step_<n>``)."""
    root = Path(root)
    if not root.exists():
        return None
    cands = sorted(
        (p for p in root.iterdir() if p.is_dir() and p.name.startswith("step_")),
        key=lambda p: int(p.name.split("_")[1]),
    )
    return cands[-1] if cands else None
