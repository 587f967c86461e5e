"""Exact mesh-level trajectory verification (the pybullet-fidelity oracle).

Combines the JAX FK poses with the native C++ BVH engine
(``sigsvgd_tpu.native.collision``) to audit trajectories against the robot's
*actual STL collision meshes*: per-waypoint environment collision (sampled
mesh-surface points vs the exact scene SDF) and mesh-vs-mesh self-collision
over the SRDF-enabled link pairs — the strongest oracle in the stack
(counterpart of ``examples/script_verify_robot_traj_with_pybullet.py``).
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.robot.kinematics import fk_poses
from ..models.robot.panda import PandaRobot
from ..models.robot.scene import Scene, scene_sdf
from ..native.collision import MeshCollisionEngine, TriMesh

# SRDF-enabled link pairs (complement of panda.srdf disable_collisions)
SRDF_CHECK_PAIRS: Tuple[Tuple[str, str], ...] = (
    ("panda_link0", "panda_link5"),
    ("panda_link0", "panda_link6"),
    ("panda_link0", "panda_link7"),
    ("panda_link0", "panda_hand"),
    ("panda_link1", "panda_link5"),
    ("panda_link1", "panda_link6"),
    ("panda_link1", "panda_link7"),
    ("panda_link1", "panda_hand"),
    ("panda_link2", "panda_link5"),
    ("panda_link2", "panda_link7"),
    ("panda_link2", "panda_hand"),
    ("panda_link5", "panda_link7"),
    ("panda_link5", "panda_hand"),
)


def _resolve_mesh_path(urdf_mesh_path: str, resources_root: Path) -> Optional[Path]:
    if urdf_mesh_path.startswith("package://"):
        rel = urdf_mesh_path[len("package://") :]
        cand = resources_root / rel
        return cand if cand.exists() else None
    p = Path(urdf_mesh_path)
    return p if p.exists() else None


class PandaMeshVerifier:
    """Loads the Panda collision meshes once; audits configurations."""

    def __init__(self, robot: PandaRobot, surface_samples: int = 300):
        self.robot = robot
        urdf_dir = Path(robot.chain.collision_meshes[0][1]).parent
        # resources root: the dir containing "robot_resources/"
        resources_root = None
        for name, mpath in robot.chain.collision_meshes:
            if mpath.startswith("package://"):
                # find a root that makes the path exist
                for cand in (
                    Path(__file__).resolve().parents[2],
                    Path(__file__).resolve().parents[3],
                ):
                    if (cand / mpath[len("package://") :]).exists():
                        resources_root = cand
                        break
                break
        if resources_root is None:
            resources_root = Path(__file__).resolve().parents[2]

        self.mesh_paths: Dict[str, str] = {}
        for link, mpath in robot.chain.collision_meshes:
            resolved = _resolve_mesh_path(mpath, resources_root)
            if resolved is not None:
                self.mesh_paths[link] = str(resolved)
        self.engine = MeshCollisionEngine(self.mesh_paths)
        # precompute local surface point clouds for env checks
        self.surface_pts = {
            link: TriMesh(p).surface_points(surface_samples)
            for link, p in self.mesh_paths.items()
        }
        self.check_pairs = [
            (a, b)
            for a, b in SRDF_CHECK_PAIRS
            if a in self.mesh_paths and b in self.mesh_paths
        ]

    def _link_poses(self, q: np.ndarray) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
        pos, rot = fk_poses(self.robot.chain, self.robot._pad_q(jnp.asarray(q)))
        pos, rot = np.asarray(pos), np.asarray(rot)
        poses = {"panda_link0": (np.zeros(3), np.eye(3))}
        for j, link in enumerate(self.robot.chain.child_links):
            poses[link] = (pos[j], rot[j])
        return poses

    def audit_config(
        self, q: np.ndarray, scene: Optional[Scene] = None, margin: float = 1e-3
    ) -> Dict[str, float]:
        """Exact audit of a single configuration: min self-collision distance
        over SRDF pairs and min environment SDF over mesh-surface points."""
        poses = self._link_poses(q)
        min_self = np.inf
        for a, b in self.check_pairs:
            d = self.engine.pairwise_distance(
                a, poses[a], b, poses[b], stop_below=margin
            )
            min_self = min(min_self, d)
            if min_self <= margin:
                break
        min_env = np.inf
        if scene is not None and scene.primitives:
            for link, pts_local in self.surface_pts.items():
                p, r = poses[link]
                world = pts_local @ r.T + p
                sdf = np.asarray(scene_sdf(scene, jnp.asarray(world)))
                min_env = min(min_env, float(sdf.min()))
        # distances are unsigned: interpenetrating surfaces report ~0, never
        # negative — "collision" means contact within the margin (default 1mm)
        return {
            "min_self_distance": float(min_self),
            "min_env_sdf": float(min_env),
            "self_collision": bool(min_self <= margin),
            "env_collision": bool(min_env <= margin) if scene else False,
        }

    def audit_trajectory(
        self, qs: np.ndarray, scene: Optional[Scene] = None, margin: float = 1e-3
    ) -> Dict[str, np.ndarray]:
        """Per-waypoint audit of a joint trajectory ``[T, dof]`` — the
        reference's "% colliding waypoints" ground-truth metric
        (``compile_robot_results_collisions.py:35-60``)."""
        rows: List[Dict[str, float]] = [
            self.audit_config(q, scene, margin) for q in np.asarray(qs)
        ]
        env = np.array([r["env_collision"] for r in rows])
        self_c = np.array([r["self_collision"] for r in rows])
        return {
            "env_collision": env,
            "self_collision": self_c,
            "fraction_colliding": float((env | self_c).mean()),
            "collision_free": bool(not (env | self_c).any()),
        }
