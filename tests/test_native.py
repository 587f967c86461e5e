"""Native C++ mesh collision engine tests (builds the .so on first run)."""
from pathlib import Path

import numpy as np
import pytest

from sigsvgd_tpu.native.collision import TriMesh, build_native_library

PANDA_MESHES = (
    Path(__file__).resolve().parents[1]
    / "robot_resources/panda/meshes/collision"
)

pytestmark = pytest.mark.skipif(
    not PANDA_MESHES.exists(), reason="panda mesh assets unavailable"
)


def _write_unit_cube_stl(path: Path):
    """Binary STL of a unit cube centered at the origin."""
    import struct

    v = np.array(
        [[x, y, z] for x in (-0.5, 0.5) for y in (-0.5, 0.5) for z in (-0.5, 0.5)]
    )
    faces = [
        (0, 1, 3), (0, 3, 2), (4, 6, 7), (4, 7, 5),  # x faces
        (0, 4, 5), (0, 5, 1), (2, 3, 7), (2, 7, 6),  # y faces
        (0, 2, 6), (0, 6, 4), (1, 5, 7), (1, 7, 3),  # z faces
    ]
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(faces)))
        for a, b, c in faces:
            f.write(struct.pack("<3f", 0, 0, 0))
            for i in (a, b, c):
                f.write(struct.pack("<3f", *v[i]))
            f.write(struct.pack("<H", 0))


def test_build_library():
    lib = build_native_library()
    assert lib.exists()


def test_cube_point_distances(tmp_path):
    p = tmp_path / "cube.stl"
    _write_unit_cube_stl(p)
    mesh = TriMesh(p)
    assert mesh.n_triangles == 12
    pts = np.array([[0, 0, 0], [1.5, 0, 0], [0.5, 0, 0], [0, 2.5, 0]], np.float32)
    d = mesh.point_distances(pts)
    # unsigned distance: center -> nearest face 0.5; outside points -> gap
    np.testing.assert_allclose(d, [0.5, 1.0, 0.0, 2.0], atol=1e-5)


def test_cube_point_distance_with_transform(tmp_path):
    p = tmp_path / "cube.stl"
    _write_unit_cube_stl(p)
    mesh = TriMesh(p)
    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = [10.0, 0.0, 0.0]
    d = mesh.point_distances(np.array([[11.5, 0, 0]], np.float32), transform=t)
    np.testing.assert_allclose(d, [1.0], atol=1e-5)


def test_cube_cube_distance(tmp_path):
    p = tmp_path / "cube.stl"
    _write_unit_cube_stl(p)
    m1, m2 = TriMesh(p), TriMesh(p)
    t1 = np.eye(4)
    t2 = np.eye(4)
    t2[:3, 3] = [3.0, 0, 0]
    d = m1.distance_to(m2, t1, t2)
    np.testing.assert_allclose(d, 2.0, atol=1e-4)
    t2[:3, 3] = [0.5, 0, 0]  # overlapping
    assert m1.distance_to(m2, t1, t2, stop_below=1e-4) < 1e-3


def test_surface_points_on_cube(tmp_path):
    p = tmp_path / "cube.stl"
    _write_unit_cube_stl(p)
    pts = TriMesh(p).surface_points(500)
    assert pts.shape == (500, 3)
    # every sample lies on the surface: max |coord| == 0.5
    maxc = np.abs(pts).max(axis=1)
    np.testing.assert_allclose(maxc, 0.5, atol=1e-5)


def test_panda_mesh_loading():
    mesh = TriMesh(PANDA_MESHES / "link0.stl")
    assert mesh.n_triangles > 50
    d = mesh.point_distances(np.array([[0, 0, 2.0]], np.float32))
    assert 1.5 < d[0] < 2.0  # link0 is ~0.14 tall


def test_mesh_verifier_free_vs_folded():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from sigsvgd_tpu.experiments.verify_mesh import PandaMeshVerifier
    from sigsvgd_tpu.models.robot import PandaRobot

    robot = PandaRobot.create()
    verifier = PandaMeshVerifier(robot, surface_samples=100)
    free = verifier.audit_config(
        np.array([0.0, -0.785, 0.0, -2.356, 0.0, 1.571, 0.785])
    )
    assert not free["self_collision"], free
    folded = verifier.audit_config(np.array([0.0, 1.7, 0.0, -2.9, 0.0, 3.6, 0.0]))
    assert folded["min_self_distance"] < free["min_self_distance"]
    assert folded["self_collision"], folded


def test_mesh_obstacle_grid_sdf_matches_analytic_box(tmp_path):
    """A box STL obstacle's BVH-grid SDF must agree with the analytic box
    SDF (outside the box, where the unsigned-distance shell semantics and
    the signed SDF coincide) to grid-resolution accuracy — a real oracle
    for the whole mesh→grid→trilinear pipeline."""
    import jax.numpy as jnp

    from sigsvgd_tpu.models.robot.mesh_scene import (
        MeshObstacle, box_mesh, grid_sdf, mesh_sdf_grid, write_stl,
    )
    from sigsvgd_tpu.models.robot.scene import Primitive, _primitive_sdf

    stl = tmp_path / "box.stl"
    write_stl(stl, box_mesh((0.3, 0.2, 0.4)))
    obst = MeshObstacle(str(stl), position=(0.1, -0.05, 0.6), margin=0.0,
                        resolution=64)
    grid = mesh_sdf_grid(obst, (-0.5, -0.5, 0.0), (0.7, 0.5, 1.2))
    ref = Primitive("box", (0.1, -0.05, 0.6), (0.3, 0.2, 0.4))

    rng = np.random.default_rng(3)
    pts = rng.uniform((-0.45, -0.45, 0.05), (0.65, 0.45, 1.15),
                      (400, 3)).astype(np.float32)
    analytic = np.asarray(_primitive_sdf(ref, jnp.asarray(pts)))
    outside = analytic > 0.05
    got = np.asarray(grid_sdf(grid, jnp.asarray(pts)))
    # trilinear on a 64^3 grid over a ~1.2m box: ~2 cm worst-case
    np.testing.assert_allclose(got[outside], analytic[outside], atol=0.025)

    # differentiable: gradient points away from the box near its surface
    import jax
    g = jax.grad(lambda p: grid_sdf(grid, p))(
        jnp.asarray([0.1, -0.05, 0.85]))  # directly above the box top
    assert float(g[2]) > 0.5


def test_mesh_obstacle_in_scene_and_yaml(tmp_path):
    """Scene SDF = min(primitives, mesh grids); YAML round-trips meshes."""
    import jax.numpy as jnp

    from sigsvgd_tpu.models.robot.mesh_scene import (
        MeshObstacle, box_mesh, write_stl,
    )
    from sigsvgd_tpu.models.robot.scene import (
        Primitive, Scene, load_scene, sample_occupancy_dataset, save_scene,
        scene_sdf,
    )

    stl = tmp_path / "slab.stl"
    write_stl(stl, box_mesh((0.4, 0.4, 0.1)))
    scene = Scene(
        name="mesh_test",
        primitives=(Primitive("sphere", (0.4, 0.4, 0.4), (0.1,)),),
        workspace_low=(-0.6, -0.6, 0.0),
        workspace_high=(0.6, 0.6, 1.0),
        meshes=(MeshObstacle(str(stl), position=(0.0, 0.0, 0.5)),),
    )
    # near the slab → mesh term wins; near the sphere → primitive wins
    d_slab = float(scene_sdf(scene, jnp.asarray([0.0, 0.0, 0.62])))
    d_sph = float(scene_sdf(scene, jnp.asarray([0.4, 0.4, 0.55])))
    assert 0.0 < d_slab < 0.12 and 0.0 < d_sph < 0.08

    import jax
    pts, labels = sample_occupancy_dataset(scene, jax.random.PRNGKey(0), 4000)
    assert 0.0 < labels.mean() < 0.5  # the slab occupies a nonzero fraction

    path = tmp_path / "scene.yaml"
    save_scene(scene, path)
    loaded = load_scene(path)
    assert loaded.meshes == scene.meshes
    d2 = float(scene_sdf(loaded, jnp.asarray([0.0, 0.0, 0.62])))
    np.testing.assert_allclose(d2, d_slab, rtol=1e-6)


def test_mesh_interior_is_negative():
    """Deep inside a closed mesh the grid SDF must be NEGATIVE (flood-fill
    sign recovery) so collision costs cannot reward tunneling through solid
    obstacles, and its gradient must point OUT of the solid."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from sigsvgd_tpu.models.robot.mesh_scene import (
        MeshObstacle, box_mesh, grid_sdf, mesh_sdf_grid, write_stl,
    )

    with tempfile.TemporaryDirectory() as d:
        stl = Path(d) / "solid.stl"
        write_stl(stl, box_mesh((0.4, 0.4, 0.4)))
        obst = MeshObstacle(str(stl), position=(0.0, 0.0, 0.5), margin=0.0,
                            resolution=48)
        grid = mesh_sdf_grid(obst, (-0.5, -0.5, 0.0), (0.5, 0.5, 1.0))
        center = float(grid_sdf(grid, jnp.asarray([0.0, 0.0, 0.5])))
        assert center < -0.1, center  # ~ -0.2 (half-extent) at the centroid
        # gradient at an interior point off-center points toward +z exit
        g = jax.grad(lambda p: grid_sdf(grid, p))(jnp.asarray([0.0, 0.0, 0.62]))
        assert float(g[2]) > 0.3, np.asarray(g)
