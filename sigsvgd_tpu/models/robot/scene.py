"""Scenes: primitive obstacle worlds with exact signed-distance fields.

Counterpart of reference ``src/models/robot/robot_scene.py`` (MoveIt-style
YAML scenes + pybullet bodies). The reference's scene *data* (meshes/datasets
under ``robodata/``, fetched by its Makefile) is not redistributable, so this
module makes the pipeline self-contained:

  * a scene is a list of posed primitives (box / sphere / cylinder / capsule),
  * the exact SDF is a pure jittable function — it is simultaneously the
    ground-truth collision oracle (pybullet's role as verifier/labeler) and
    the generator of occupancy-map training data,
  * YAML load/save for scene + path-request files.

SDF queries over ``batch × timesteps × body-points`` vectorize into a handful
of fused elementwise ops on TPU.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.math import safe_norm
from .mesh_scene import MeshObstacle, grid_sdf, mesh_sdf_grid

try:
    import yaml
except ImportError:  # pragma: no cover
    yaml = None


@dataclasses.dataclass(frozen=True)
class Primitive:
    """A posed primitive. ``kind`` ∈ {box, sphere, cylinder, capsule}.

    ``size``: box → (sx, sy, sz) full extents; sphere → (r,); cylinder/capsule
    → (r, half_height). ``rot`` is a row-major 3×3 world-from-local rotation.
    """

    kind: str
    position: Tuple[float, float, float]
    size: Tuple[float, ...]
    rot: Tuple[float, ...] = (1, 0, 0, 0, 1, 0, 0, 0, 1)


@dataclasses.dataclass(frozen=True)
class Scene:
    """Obstacles = analytic primitives + (optionally) posed triangle meshes.

    Mesh obstacles ride a host-precomputed BVH distance grid with a
    differentiable on-device lookup (``mesh_scene.py``) — the reference's
    pybullet mesh bodies (``robot_scene.py:325-385``) mapped to the
    TPU-compatible split."""

    name: str
    primitives: Tuple[Primitive, ...]
    workspace_low: Tuple[float, float, float] = (-1.0, -1.0, 0.0)
    workspace_high: Tuple[float, float, float] = (1.0, 1.0, 1.5)
    meshes: Tuple["MeshObstacle", ...] = ()


def _primitive_sdf_xyz(p: Primitive, px, py, pz) -> jax.Array:
    """Signed distance of points given as COMPONENT arrays ``px/py/pz [...]``.

    Component form keeps every op on fully-packed batch-shaped vregs — a
    trailing ``[..., 3]`` axis occupies 3 of 128 lanes (~40x VPU waste) —
    and the pose constants (Python floats at trace time) fold away for the
    axis-aligned primitives every built-in scene uses."""
    from .kinematics import _add, _mul

    R = np.asarray(p.rot, np.float64).reshape(3, 3)
    c = [float(v) for v in p.position]
    d = [comp if ci == 0.0 else comp - ci for comp, ci in zip((px, py, pz), c)]
    # local = R.T @ (x - pos); R entries are trace-time floats
    local = []
    for i in range(3):
        e = 0.0
        for j in range(3):
            e = _add(e, _mul(float(R[j, i]), d[j]))
        local.append(e)
    lx, ly, lz = local

    def _safe_sqrt(s):
        return jnp.sqrt(s + 1e-12)  # matches utils.math.safe_norm

    if p.kind == "box":
        hx, hy, hz = (float(s) / 2.0 for s in p.size)
        qx = jnp.abs(lx) - hx
        qy = jnp.abs(ly) - hy
        qz = jnp.abs(lz) - hz
        ox = jnp.maximum(qx, 0.0)
        oy = jnp.maximum(qy, 0.0)
        oz = jnp.maximum(qz, 0.0)
        outside = _safe_sqrt(ox * ox + oy * oy + oz * oz)
        inside = jnp.minimum(jnp.maximum(qx, jnp.maximum(qy, qz)), 0.0)
        return outside + inside
    if p.kind == "sphere":
        return _safe_sqrt(lx * lx + ly * ly + lz * lz) - float(p.size[0])
    if p.kind == "cylinder":
        r, hh = float(p.size[0]), float(p.size[1])
        d_r = _safe_sqrt(lx * lx + ly * ly) - r
        d_z = jnp.abs(lz) - hh
        o_r = jnp.maximum(d_r, 0.0)
        o_z = jnp.maximum(d_z, 0.0)
        outside = _safe_sqrt(o_r * o_r + o_z * o_z)
        inside = jnp.minimum(jnp.maximum(d_r, d_z), 0.0)
        return outside + inside
    if p.kind == "capsule":
        r, hh = float(p.size[0]), float(p.size[1])
        dz = lz - jnp.clip(lz, -hh, hh)
        return _safe_sqrt(lx * lx + ly * ly + dz * dz) - r
    raise ValueError(f"Unknown primitive kind: {p.kind}")


def _primitive_sdf(p: Primitive, x: jax.Array) -> jax.Array:
    """Signed distance of points ``x [..., 3]`` to one primitive."""
    return _primitive_sdf_xyz(p, x[..., 0], x[..., 1], x[..., 2])


def scene_sdf(scene: Scene, x: jax.Array) -> jax.Array:
    """Scene SDF: min over primitives (exact) and mesh obstacles (BVH grid,
    trilinear). ``x [..., 3] → [...]``."""
    ds = [_primitive_sdf(p, x) for p in scene.primitives]
    for m in scene.meshes:
        grid = mesh_sdf_grid(m, scene.workspace_low, scene.workspace_high)
        ds.append(grid_sdf(grid, x))
    if not ds:
        return jnp.full(x.shape[:-1], jnp.inf, x.dtype)
    return jnp.min(jnp.stack(ds, axis=0), axis=0)


def scene_occupancy(scene: Scene, x: jax.Array, margin: float = 0.0) -> jax.Array:
    """Hard {0,1} occupancy label at points ``x`` (ground truth for training
    the occupancy MLP and for trajectory verification)."""
    return (scene_sdf(scene, x) <= margin).astype(jnp.float32)


def sample_occupancy_dataset(
    scene: Scene, key: jax.Array, n: int, margin: float = 0.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Uniform workspace samples + exact labels → occupancy training data
    (replaces the reference's per-scene CSV point clouds,
    ``continuous_occupancy_map.py:84-125``)."""
    low = jnp.asarray(scene.workspace_low)
    high = jnp.asarray(scene.workspace_high)
    pts = jax.random.uniform(key, (n, 3), minval=low, maxval=high)
    labels = scene_occupancy(scene, pts, margin)
    return np.asarray(pts), np.asarray(labels)


# ---------------------------------------------------------------------------
# YAML round-trip (MoveIt-ish flavor of the reference's scene files,
# robot_scene.py:325-385).
# ---------------------------------------------------------------------------


def scene_to_dict(scene: Scene) -> dict:
    return {
        "name": scene.name,
        "workspace": {
            "low": list(scene.workspace_low),
            "high": list(scene.workspace_high),
        },
        "primitives": [
            {
                "kind": p.kind,
                "position": list(p.position),
                "size": list(p.size),
                "rot": list(p.rot),
            }
            for p in scene.primitives
        ],
        "meshes": [
            {
                "path": m.path,
                "position": list(m.position),
                "rot": list(m.rot),
                "margin": m.margin,
                "resolution": m.resolution,
            }
            for m in scene.meshes
        ],
    }


def scene_from_dict(d: dict) -> Scene:
    return Scene(
        name=d.get("name", "scene"),
        primitives=tuple(
            Primitive(
                kind=p["kind"],
                position=tuple(p["position"]),
                size=tuple(p["size"]),
                rot=tuple(p.get("rot", (1, 0, 0, 0, 1, 0, 0, 0, 1))),
            )
            for p in d.get("primitives", [])
        ),
        workspace_low=tuple(d.get("workspace", {}).get("low", (-1, -1, 0))),
        workspace_high=tuple(d.get("workspace", {}).get("high", (1, 1, 1.5))),
        meshes=tuple(
            MeshObstacle(
                path=m["path"],
                position=tuple(m.get("position", (0, 0, 0))),
                rot=tuple(m.get("rot", (1, 0, 0, 0, 1, 0, 0, 0, 1))),
                margin=float(m.get("margin", 0.02)),
                resolution=int(m.get("resolution", 48)),
            )
            for m in d.get("meshes", [])
        ),
    )


def save_scene(scene: Scene, path: str | Path) -> None:
    assert yaml is not None, "pyyaml required"
    Path(path).write_text(yaml.safe_dump(scene_to_dict(scene)))


def load_scene(path: str | Path) -> Scene:
    assert yaml is not None, "pyyaml required"
    return scene_from_dict(yaml.safe_load(Path(path).read_text()))


@dataclasses.dataclass(frozen=True)
class PathRequest:
    """Start/goal joint configurations (reference ``robot_scene.py:203-227``)."""

    start: Tuple[float, ...]
    target: Tuple[float, ...]

    @staticmethod
    def from_yaml(path: str | Path) -> "PathRequest":
        d = yaml.safe_load(Path(path).read_text())
        return PathRequest(start=tuple(d["start"]), target=tuple(d["target"]))

    def to_yaml(self, path: str | Path) -> None:
        Path(path).write_text(
            yaml.safe_dump({"start": list(self.start), "target": list(self.target)})
        )


# ---------------------------------------------------------------------------
# Built-in scene library (9 tags like the reference's robodata scenes,
# robot_scene.py:19-29 — ours are authored primitive worlds).
# ---------------------------------------------------------------------------


def _shelf(name: str, x: float = 0.55) -> Scene:
    boards = []
    for z in (0.2, 0.5, 0.8, 1.1):
        boards.append(Primitive("box", (x, 0.0, z), (0.3, 0.8, 0.03)))
    boards.append(Primitive("box", (x, -0.4, 0.65), (0.3, 0.03, 0.93)))
    boards.append(Primitive("box", (x, 0.4, 0.65), (0.3, 0.03, 0.93)))
    return Scene(name, tuple(boards))


def _table_cluster(name: str) -> Scene:
    prims = [
        Primitive("box", (0.5, 0.0, 0.2), (0.7, 1.0, 0.04)),
        Primitive("cylinder", (0.45, 0.25, 0.35), (0.06, 0.13)),
        Primitive("cylinder", (0.55, -0.2, 0.33), (0.05, 0.11)),
        Primitive("box", (0.35, -0.05, 0.3), (0.12, 0.12, 0.16)),
    ]
    return Scene(name, tuple(prims))


def _cage(name: str) -> Scene:
    bars = []
    for sx in (-0.35, 0.35):
        for sy in (-0.35, 0.35):
            bars.append(Primitive("box", (0.5 + sx * 0.4, sy, 0.6), (0.04, 0.04, 1.2)))
    bars.append(Primitive("box", (0.5, 0.0, 1.2), (0.5, 0.8, 0.04)))
    return Scene(name, tuple(bars))


def _window(name: str) -> Scene:
    prims = [
        Primitive("box", (0.55, 0.0, 0.25), (0.04, 1.2, 0.5)),
        Primitive("box", (0.55, 0.0, 1.05), (0.04, 1.2, 0.5)),
        Primitive("box", (0.55, -0.45, 0.65), (0.04, 0.3, 0.3)),
        Primitive("box", (0.55, 0.45, 0.65), (0.04, 0.3, 0.3)),
    ]
    return Scene(name, tuple(prims))


def _bookshelf_thin(name: str) -> Scene:
    """Tall narrow shelf with tight vertical clearances (analog of the
    reference's ``bookshelf_thin_panda``, robot_scene.py:21)."""
    boards = []
    for z in (0.15, 0.38, 0.61, 0.84, 1.07, 1.3):
        boards.append(Primitive("box", (0.55, 0.0, z), (0.26, 0.5, 0.025)))
    boards.append(Primitive("box", (0.55, -0.25, 0.72), (0.26, 0.025, 1.17)))
    boards.append(Primitive("box", (0.55, 0.25, 0.72), (0.26, 0.025, 1.17)))
    boards.append(Primitive("box", (0.68, 0.0, 0.72), (0.025, 0.5, 1.17)))
    return Scene(name, tuple(boards))


def _box(name: str) -> Scene:
    """Open-top box the arm must reach into (``box_panda`` analog)."""
    walls = [
        Primitive("box", (0.55, 0.0, 0.1), (0.4, 0.4, 0.03)),  # floor
        Primitive("box", (0.35, 0.0, 0.3), (0.03, 0.4, 0.4)),
        Primitive("box", (0.75, 0.0, 0.3), (0.03, 0.4, 0.4)),
        Primitive("box", (0.55, -0.2, 0.3), (0.4, 0.03, 0.4)),
        Primitive("box", (0.55, 0.2, 0.3), (0.4, 0.03, 0.4)),
    ]
    return Scene(name, tuple(walls))


def _kitchen(name: str) -> Scene:
    """Counter + overhead cabinet + side wall (``kitchen_panda`` analog):
    the arm works in the gap between the counter top and the cabinet."""
    prims = [
        Primitive("box", (0.55, 0.0, 0.35), (0.6, 1.2, 0.04)),  # counter
        Primitive("box", (0.6, 0.0, 1.15), (0.5, 1.2, 0.3)),    # cabinet
        Primitive("box", (0.55, -0.55, 0.75), (0.6, 0.04, 0.85)),  # side wall
        Primitive("box", (0.82, 0.15, 0.47), (0.08, 0.08, 0.2)),   # appliance
        Primitive("cylinder", (0.45, 0.35, 0.45), (0.05, 0.17)),   # pot
    ]
    return Scene(name, tuple(prims))


def _table_bars(name: str) -> Scene:
    """Table with a grid of vertical bars above it (``table_bars_panda``
    analog): motion must thread between the bars."""
    prims = [Primitive("box", (0.55, 0.0, 0.25), (0.7, 1.0, 0.04))]
    for y in (-0.3, 0.0, 0.3):
        prims.append(Primitive("box", (0.55, y, 0.65), (0.04, 0.04, 0.76)))
    prims.append(Primitive("box", (0.55, 0.0, 1.05), (0.7, 1.0, 0.04)))
    return Scene(name, tuple(prims))


def _pillars(name: str, n: int = 4) -> Scene:
    rng = np.random.default_rng(hash(name) % (2**31))
    prims = []
    for _ in range(n):
        x = float(rng.uniform(0.3, 0.7))
        y = float(rng.uniform(-0.45, 0.45))
        r = float(rng.uniform(0.03, 0.07))
        prims.append(Primitive("cylinder", (x, y, 0.6), (r, 0.6)))
    return Scene(name, tuple(prims))


# the first nine mirror the reference's robodata tags one-for-one
# (robot_scene.py:19-29, "_panda" suffix dropped); the rest are extras
SCENE_TAGS = (
    "bookshelf_small",
    "bookshelf_tall",
    "bookshelf_thin",
    "box",
    "cage",
    "kitchen",
    "table_bars",
    "table_pick",
    "table_under_pick",
    "window",
    "pillars_4",
    "pillars_6",
    "empty",
)


def get_scene(tag: str) -> Scene:
    if tag == "bookshelf_small":
        return _shelf(tag, 0.5)
    if tag == "bookshelf_tall":
        return _shelf(tag, 0.6)
    if tag == "table_pick":
        return _table_cluster(tag)
    if tag == "table_under_pick":
        s = _table_cluster(tag)
        return Scene(tag, s.primitives + (Primitive("box", (0.5, 0.0, 0.55), (0.5, 0.6, 0.03)),))
    if tag == "bookshelf_thin":
        return _bookshelf_thin(tag)
    if tag == "box":
        return _box(tag)
    if tag == "kitchen":
        return _kitchen(tag)
    if tag == "table_bars":
        return _table_bars(tag)
    if tag == "cage":
        return _cage(tag)
    if tag == "window":
        return _window(tag)
    if tag == "pillars_4":
        return _pillars(tag, 4)
    if tag == "pillars_6":
        return _pillars(tag, 6)
    if tag == "empty":
        return Scene(tag, ())
    raise ValueError(f"Unknown scene tag {tag}; available: {SCENE_TAGS}")
