"""Experiment helpers: seeding, project paths, artifact saving.

Counterpart of reference ``src/utils/helper.py:10-114`` — PRNG handling is
explicit JAX keys (no global seeding needed for determinism under jit).
"""
from __future__ import annotations

import json
import pickle
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import numpy as np


def enable_compile_cache(path: str = "/tmp/sigsvgd_jax_cache") -> None:
    """Persist XLA compilations across processes. The TPU in this container
    compiles through a remote tunnel (minutes for large programs); every
    experiment entry point calls this so repeat runs start hot."""
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def generate_seeds(n: int, root_seed: int = 42) -> List[int]:
    """Deterministic list of experiment seeds."""
    rng = np.random.default_rng(root_seed)
    return [int(s) for s in rng.integers(0, 2**31 - 1, size=n)]


def seed_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def get_project_root() -> Path:
    return Path(__file__).resolve().parents[2]


def _to_numpy(x):
    if isinstance(x, (jax.Array, np.ndarray)):
        return np.asarray(x)
    if isinstance(x, dict):
        return {k: _to_numpy(v) for k, v in x.items()}
    if isinstance(x, tuple):
        if hasattr(x, "_fields"):
            # NamedTuples (RunData, DuStData, ...): positional construction
            return type(x)(*[_to_numpy(v) for v in x])
        return tuple(_to_numpy(v) for v in x)
    if isinstance(x, list):
        return [_to_numpy(v) for v in x]
    return x


def save_progress(
    folder_name: Path,
    data: Optional[Dict[str, Any]] = None,
    config: Optional[Dict[str, Any]] = None,
    session: bool = False,
) -> Path:
    """Persist experiment artifacts: ``data.pkl`` (numpy-ified pytrees),
    ``config.json``, and optionally a ``session.pkl`` snapshot of the
    caller's module globals (parity with reference ``helper.py:42-100``,
    whose optional ``dill.dump_session`` captures the interpreter state)."""
    folder = Path(folder_name)
    folder.mkdir(parents=True, exist_ok=True)
    if data is not None:
        with open(folder / "data.pkl", "wb") as f:
            pickle.dump(_to_numpy(data), f)
    if config is not None:
        with open(folder / "config.json", "w") as f:
            json.dump(config, f, indent=2, default=str)
    if session:
        _dump_session(folder / "session.pkl")
    return folder


def _dump_session(path: Path) -> None:
    """Best-effort interpreter-session snapshot. dill is not in the TPU
    image, so the calling frame's globals are pickled name-by-name
    (device arrays numpy-ified first); unpicklable entries — modules,
    functions with closures over clients, live tracers — are skipped and
    their names recorded under ``__skipped__`` so a restored session knows
    what it is missing."""
    import inspect

    frame = inspect.currentframe()
    g: Dict[str, Any] = {}
    try:
        caller = frame.f_back.f_back  # the save_progress caller
        g = dict(caller.f_globals)
        g.update(caller.f_locals)
    finally:
        del frame
    snap: Dict[str, Any] = {}
    skipped: List[str] = []
    for k, v in g.items():
        if k.startswith("__"):
            continue
        try:
            snap[k] = pickle.loads(pickle.dumps(_to_numpy(v)))
        except Exception:
            skipped.append(k)
    with open(path, "wb") as f:
        pickle.dump({"vars": snap, "__skipped__": sorted(skipped)}, f)


def load_session(folder_name: Path) -> Dict[str, Any]:
    """Load a ``save_progress(..., session=True)`` snapshot: returns
    ``{"vars": {...}, "__skipped__": [...]}``."""
    with open(Path(folder_name) / "session.pkl", "rb") as f:
        return pickle.load(f)


def load_progress(folder_name: Path) -> Dict[str, Any]:
    with open(Path(folder_name) / "data.pkl", "rb") as f:
        return pickle.load(f)


def assert_finite_pytree(tree: Any, name: str = "pytree") -> None:
    """Failure detection: raise with the offending leaf path if any array in
    the pytree contains NaN/Inf (the reference's analog is NaN-prefilled sim
    buffers + an LBFGS legality check, SURVEY.md §5.3 — here it's an explicit
    check experiments call on results/state before persisting)."""
    import jax

    leaves = jax.tree_util.tree_leaves_with_path(tree)
    bad = []
    for path, leaf in leaves:
        if hasattr(leaf, "dtype") and jnp_issubdtype_inexact(leaf):
            arr = np.asarray(leaf)
            if not np.isfinite(arr).all():
                bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")


def jnp_issubdtype_inexact(leaf) -> bool:
    return np.issubdtype(np.asarray(leaf).dtype, np.inexact)
