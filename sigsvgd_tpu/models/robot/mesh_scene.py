"""Triangle-mesh obstacles for planning scenes.

The reference builds scenes from YAML primitives AND meshes, checked by
pybullet's mesh collision engine (``robot_scene.py:325-385``). Here the
TPU-first split is:

  * host side (once, at trace time): the C++ BVH engine
    (``native/collision.py``) evaluates unsigned point→mesh distances over a
    dense workspace lattice → an SDF **grid**;
  * device side (hot path): the scene SDF for a mesh obstacle is a
    differentiable trilinear interpolation of that grid — pure gathers +
    FMAs, jit/vmap-friendly, with piecewise-linear gradients for the
    collision costs.

Meshes are treated as thin shells inflated by ``margin`` (the BVH returns
unsigned distance; containment sign is not needed for obstacle avoidance —
any point within ``margin`` of the surface counts as occupied, and planning
costs push trajectories outside the inflated shell). Grids are cached per
(mesh, pose, resolution) so repeated tracing reuses the host precompute.
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache
from pathlib import Path
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MeshObstacle", "SdfGrid", "mesh_sdf_grid", "grid_sdf", "write_stl"]


@dataclasses.dataclass(frozen=True)
class MeshObstacle:
    """A posed STL mesh obstacle. ``rot`` row-major 3×3 world-from-mesh."""

    path: str
    position: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    rot: Tuple[float, ...] = (1, 0, 0, 0, 1, 0, 0, 0, 1)
    margin: float = 0.02  # shell inflation (occupied ⇔ dist ≤ margin)
    resolution: int = 48  # grid points per axis over the scene workspace


@dataclasses.dataclass(frozen=True)
class SdfGrid:
    """Dense distance grid over an axis-aligned box (host numpy)."""

    origin: Tuple[float, float, float]
    spacing: Tuple[float, float, float]
    values: np.ndarray  # [nx, ny, nz] float32 (unsigned dist − margin)


@lru_cache(maxsize=64)
def _cached_grid(
    obstacle: MeshObstacle,
    low: Tuple[float, float, float],
    high: Tuple[float, float, float],
) -> SdfGrid:
    from ...native.collision import TriMesh

    mesh = TriMesh(obstacle.path)
    n = obstacle.resolution
    lo = np.asarray(low, np.float64)
    hi = np.asarray(high, np.float64)
    axes = [np.linspace(lo[d], hi[d], n) for d in range(3)]
    pts = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)
    tf = np.eye(4, dtype=np.float32)
    tf[:3, :3] = np.asarray(obstacle.rot, np.float32).reshape(3, 3)
    tf[:3, 3] = obstacle.position
    dists = mesh.point_distances(pts.astype(np.float32), transform=tf)
    dists = dists.astype(np.float32).reshape(n, n, n)
    spacing = (hi - lo) / (n - 1)
    # sign recovery for CLOSED meshes: the BVH distance is unsigned, so a
    # point deep inside a solid would read as free. Flood-fill the lattice
    # from the workspace border through cells farther than one cell diagonal
    # from the surface; unreached components are the interior, where the
    # signed distance is −(distance to surface). Open meshes have no enclosed
    # component and keep the thin-shell semantics.
    shell_eps = float(np.linalg.norm(spacing))
    passable = dists > shell_eps
    try:
        from scipy import ndimage

        labels, _ = ndimage.label(passable)
        border_labels = np.unique(
            np.concatenate([
                labels[0].ravel(), labels[-1].ravel(),
                labels[:, 0].ravel(), labels[:, -1].ravel(),
                labels[:, :, 0].ravel(), labels[:, :, -1].ravel(),
            ])
        )
        outside = np.isin(labels, border_labels[border_labels != 0])
        interior = passable & ~outside
        dists = np.where(interior, -dists, dists)
    except ImportError:  # pragma: no cover - scipy is in the image
        pass
    values = (dists - obstacle.margin).astype(np.float32)
    return SdfGrid(tuple(map(float, lo)), tuple(map(float, spacing)), values)


def mesh_sdf_grid(
    obstacle: MeshObstacle,
    workspace_low: Tuple[float, float, float],
    workspace_high: Tuple[float, float, float],
) -> SdfGrid:
    """Host-side precompute (cached): BVH distances over the lattice."""
    return _cached_grid(obstacle, tuple(workspace_low), tuple(workspace_high))


def grid_sdf(grid: SdfGrid, x: jax.Array) -> jax.Array:
    """Differentiable trilinear lookup of ``x [..., 3]`` in the grid.

    Queries outside the lattice clamp to the border cell — obstacles live
    inside the workspace, so border values are 'far'."""
    vals = jnp.asarray(grid.values)
    origin = jnp.asarray(grid.origin, x.dtype)
    spacing = jnp.asarray(grid.spacing, x.dtype)
    shape = jnp.asarray(vals.shape, jnp.float32)

    u = (x - origin) / spacing
    u = jnp.clip(u, 0.0, shape - 1.000001)
    i0 = jnp.floor(u).astype(jnp.int32)
    f = u - i0

    def at(dx, dy, dz):
        idx = i0 + jnp.asarray([dx, dy, dz], jnp.int32)
        return vals[idx[..., 0], idx[..., 1], idx[..., 2]]

    c00 = at(0, 0, 0) * (1 - f[..., 0]) + at(1, 0, 0) * f[..., 0]
    c01 = at(0, 0, 1) * (1 - f[..., 0]) + at(1, 0, 1) * f[..., 0]
    c10 = at(0, 1, 0) * (1 - f[..., 0]) + at(1, 1, 0) * f[..., 0]
    c11 = at(0, 1, 1) * (1 - f[..., 0]) + at(1, 1, 1) * f[..., 0]
    c0 = c00 * (1 - f[..., 1]) + c10 * f[..., 1]
    c1 = c01 * (1 - f[..., 1]) + c11 * f[..., 1]
    return c0 * (1 - f[..., 2]) + c1 * f[..., 2]


# ---------------------------------------------------------------------------
# Minimal binary-STL writer (test meshes + user convenience; the reference
# ships .obj/.stl assets — we can synthesize our own).
# ---------------------------------------------------------------------------


def write_stl(path: str | Path, triangles: np.ndarray) -> None:
    """Write ``[n, 3, 3]`` float triangles as a binary STL."""
    tris = np.asarray(triangles, np.float32)
    n = tris.shape[0]
    ab = tris[:, 1] - tris[:, 0]
    ac = tris[:, 2] - tris[:, 0]
    normals = np.cross(ab, ac)
    lens = np.linalg.norm(normals, axis=-1, keepdims=True)
    normals = normals / np.maximum(lens, 1e-12)
    rec = np.zeros(n, dtype=np.dtype([("n", "<f4", 3), ("v", "<f4", (3, 3)),
                                      ("attr", "<u2")]))
    rec["n"] = normals
    rec["v"] = tris
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(np.uint32(n).tobytes())
        f.write(rec.tobytes())


def box_mesh(extents: Tuple[float, float, float]) -> np.ndarray:
    """``[12, 3, 3]`` triangles of an origin-centered box (test oracle:
    its grid SDF must match the analytic box SDF)."""
    hx, hy, hz = (e / 2.0 for e in extents)
    v = np.array(
        [[sx * hx, sy * hy, sz * hz]
         for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        np.float32,
    )  # index bit-pattern: (x<<2)|(y<<1)|z
    quads = [
        (0, 1, 3, 2), (4, 6, 7, 5),  # x faces
        (0, 4, 5, 1), (2, 3, 7, 6),  # y faces
        (0, 2, 6, 4), (1, 5, 7, 3),  # z faces
    ]
    tris = []
    for a, b, c, d in quads:
        tris.append([v[a], v[b], v[c]])
        tris.append([v[a], v[c], v[d]])
    return np.asarray(tris, np.float32)
