"""ctypes bindings for the native mesh collision/distance engine.

The C++ library (``native/collision/collision.cpp``) plays pybullet's role
from the reference: exact STL-mesh distance/collision queries for trajectory
verification and high-fidelity dataset labeling (it is host-side by design;
the TPU hot path uses learned/SDF costs). Built on demand with ``g++ -O3``.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "collision" / "collision.cpp"
_LIB = _REPO_ROOT / "native" / "collision" / "libcollision.so"


def build_native_library(force: bool = False) -> Path:
    """Compile the shared library if missing/outdated."""
    if _LIB.exists() and not force:
        if _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
            return _LIB
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB)],
        check=True,
    )
    return _LIB


_cdll = None


def _lib() -> ctypes.CDLL:
    global _cdll
    if _cdll is None:
        lib = ctypes.CDLL(str(build_native_library()))
        lib.mesh_load_stl.restype = ctypes.c_void_p
        lib.mesh_load_stl.argtypes = [ctypes.c_char_p]
        lib.mesh_free.argtypes = [ctypes.c_void_p]
        lib.mesh_num_triangles.restype = ctypes.c_int
        lib.mesh_num_triangles.argtypes = [ctypes.c_void_p]
        lib.mesh_get_triangles.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.mesh_point_distances.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.mesh_point_distances_tf.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.mesh_mesh_distance.restype = ctypes.c_float
        lib.mesh_mesh_distance.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_float,
        ]
        _cdll = lib
    return _cdll


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class TriMesh:
    """A loaded STL mesh with its BVH (owned by the native library)."""

    def __init__(self, path: str | Path):
        self._lib = _lib()
        self._handle = self._lib.mesh_load_stl(str(path).encode())
        if not self._handle:
            raise FileNotFoundError(f"failed to load STL mesh: {path}")
        self.path = str(path)

    @property
    def n_triangles(self) -> int:
        return self._lib.mesh_num_triangles(self._handle)

    def triangles(self) -> np.ndarray:
        """``[n_tris, 3, 3]`` vertex array."""
        out = np.empty((self.n_triangles, 9), np.float32)
        self._lib.mesh_get_triangles(self._handle, _fptr(out))
        return out.reshape(-1, 3, 3)

    def surface_points(self, n: int, seed: int = 0) -> np.ndarray:
        """Area-weighted uniform samples on the mesh surface ``[n, 3]``."""
        tris = self.triangles().astype(np.float64)
        ab = tris[:, 1] - tris[:, 0]
        ac = tris[:, 2] - tris[:, 0]
        areas = 0.5 * np.linalg.norm(np.cross(ab, ac), axis=-1)
        p = areas / areas.sum()
        rng = np.random.default_rng(seed)
        idx = rng.choice(len(tris), size=n, p=p)
        u = rng.random(n)
        v = rng.random(n)
        flip = u + v > 1
        u[flip], v[flip] = 1 - u[flip], 1 - v[flip]
        pts = tris[idx, 0] + u[:, None] * ab[idx] + v[:, None] * ac[idx]
        return pts.astype(np.float32)

    def point_distances(
        self, pts: np.ndarray, transform: Optional[np.ndarray] = None
    ) -> np.ndarray:
        """Unsigned distances from world points ``[n, 3]`` to the mesh; with
        ``transform`` (``[3or4, 4]`` rigid world-from-mesh), points are pulled
        into the mesh frame."""
        pts = np.ascontiguousarray(pts, np.float32).reshape(-1, 3)
        out = np.empty(pts.shape[0], np.float32)
        if transform is None:
            self._lib.mesh_point_distances(
                self._handle, _fptr(pts), pts.shape[0], _fptr(out)
            )
        else:
            t = np.ascontiguousarray(np.asarray(transform, np.float32)[:3, :4])
            self._lib.mesh_point_distances_tf(
                self._handle, _fptr(t), _fptr(pts), pts.shape[0], _fptr(out)
            )
        return out

    def distance_to(
        self,
        other: "TriMesh",
        transform_self: np.ndarray,
        transform_other: np.ndarray,
        stop_below: float = 0.0,
    ) -> float:
        """Minimum distance between this mesh and ``other`` under rigid
        transforms (``[3or4, 4]``); early-exits when below ``stop_below``."""
        t1 = np.ascontiguousarray(np.asarray(transform_self, np.float32)[:3, :4])
        t2 = np.ascontiguousarray(np.asarray(transform_other, np.float32)[:3, :4])
        return float(
            self._lib.mesh_mesh_distance(
                self._handle, _fptr(t1), other._handle, _fptr(t2), stop_below
            )
        )

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.mesh_free(self._handle)
        except Exception:
            pass


class MeshCollisionEngine:
    """Exact mesh-level collision auditing for an articulated robot.

    Loads the URDF's collision STLs once; ``self_collision_distances`` checks
    mesh pairs under FK poses (the reference's pybullet
    ``get_collision_functor`` role, ``robot_simulator.py:221-299``).
    """

    def __init__(self, mesh_paths: Dict[str, str]):
        self.meshes = {name: TriMesh(p) for name, p in mesh_paths.items()}

    @staticmethod
    def _pose_matrix(pos: np.ndarray, rot: np.ndarray) -> np.ndarray:
        t = np.eye(4, dtype=np.float32)
        t[:3, :3] = rot
        t[:3, 3] = pos
        return t

    def pairwise_distance(
        self,
        link_a: str,
        pose_a: Tuple[np.ndarray, np.ndarray],
        link_b: str,
        pose_b: Tuple[np.ndarray, np.ndarray],
        stop_below: float = 0.0,
    ) -> float:
        ta = self._pose_matrix(*pose_a)
        tb = self._pose_matrix(*pose_b)
        return self.meshes[link_a].distance_to(self.meshes[link_b], ta, tb, stop_below)

    def points_min_distance(
        self, link: str, pose: Tuple[np.ndarray, np.ndarray], pts: np.ndarray
    ) -> np.ndarray:
        return self.meshes[link].point_distances(pts, self._pose_matrix(*pose))
