"""Robot stack tests: URDF/FK correctness, IK, scenes, self-collision, planning."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigsvgd_tpu.models.robot import PandaRobot, parse_urdf
from sigsvgd_tpu.models.robot.scene import (
    PathRequest,
    Primitive,
    Scene,
    get_scene,
    sample_occupancy_dataset,
    scene_from_dict,
    scene_sdf,
    scene_to_dict,
)
from sigsvgd_tpu.models.robot.self_collision import (
    segment_distance,
    self_collision,
    self_collision_margins,
)


@pytest.fixture(scope="module")
def robot():
    return PandaRobot.create()


def test_urdf_parse(robot):
    chain = robot.chain
    assert chain.dof == 9  # 7 arm + 2 fingers
    assert robot.dof == 7
    assert chain.joint_names[0] == "panda_joint1"
    lo, hi = robot.joint_limits()
    np.testing.assert_allclose(float(lo[0]), -2.9671, rtol=1e-4)


def test_fk_known_zero_config(robot):
    xs = robot.qs_to_joints_xs(jnp.zeros((7,)))
    assert xs.shape == (9, 3)
    # panda_link1 sits at z=0.333; panda_hand at [0.088, 0, 0.926] for q=0
    np.testing.assert_allclose(np.asarray(xs[0]), [0, 0, 0.333], atol=1e-6)
    np.testing.assert_allclose(np.asarray(xs[-1]), [0.088, 0, 0.926], atol=1e-4)


def test_fk_joint1_rotation_moves_x(robot):
    """Rotating joint1 (about z) by π/2 maps the EE x-offset onto y."""
    q = jnp.zeros((7,)).at[0].set(jnp.pi / 2)
    ee = np.asarray(robot.ee_position(q))
    np.testing.assert_allclose(ee, [0.0, 0.088, 0.926], atol=1e-4)


def test_fk_batched_and_jacobian_fd(robot):
    key = jax.random.PRNGKey(0)
    lo, hi = robot.joint_limits()
    q = jax.random.uniform(key, (4, 7), minval=lo * 0.8, maxval=hi * 0.8)
    xs = robot.qs_to_joints_xs(q)
    assert xs.shape == (4, 9, 3)
    jac = robot.jacobian(q)
    assert jac.shape == (4, 3, 7)
    eps = 1e-4
    qp = q.at[1, 3].add(eps)
    qm = q.at[1, 3].add(-eps)
    fd = (robot.ee_position(qp[1]) - robot.ee_position(qm[1])) / (2 * eps)
    np.testing.assert_allclose(np.asarray(jac[1, :, 3]), np.asarray(fd), atol=1e-2)


def test_ik_reaches_target(robot):
    q_true = jnp.asarray([0.3, -0.5, 0.2, -1.8, 0.1, 1.5, 0.4])
    target = robot.ee_position(q_true)
    q_sol = robot.ee_xs_to_qs(target[None], iters=200)
    err = float(jnp.linalg.norm(robot.ee_position(q_sol[0]) - target))
    assert err < 0.01, f"IK position error {err}"


def test_scene_sdf_box_and_sphere():
    scene = Scene(
        "t",
        (
            Primitive("box", (0, 0, 0), (2.0, 2.0, 2.0)),
            Primitive("sphere", (5, 0, 0), (1.0,)),
        ),
    )
    d = scene_sdf(scene, jnp.asarray([[0.0, 0, 0], [2.0, 0, 0], [5.0, 0, 0], [7.0, 0, 0]]))
    np.testing.assert_allclose(np.asarray(d), [-1.0, 1.0, -1.0, 1.0], atol=1e-6)


def test_scene_sdf_cylinder_capsule():
    scene = Scene("t", (Primitive("cylinder", (0, 0, 0), (0.5, 1.0)),))
    d = scene_sdf(scene, jnp.asarray([[0.0, 0, 0], [1.0, 0, 0], [0.0, 0, 1.5]]))
    np.testing.assert_allclose(np.asarray(d), [-0.5, 0.5, 0.5], atol=1e-5)
    cap = Scene("t", (Primitive("capsule", (0, 0, 0), (0.5, 1.0)),))
    d = scene_sdf(cap, jnp.asarray([[0.0, 0, 1.5], [0.0, 0, 0.0]]))
    np.testing.assert_allclose(np.asarray(d), [0.0, -0.5], atol=1e-5)


def test_scene_yaml_roundtrip():
    scene = get_scene("table_pick")
    d = scene_to_dict(scene)
    scene2 = scene_from_dict(d)
    assert scene2.primitives == scene.primitives


def test_builtin_scenes_all_load():
    from sigsvgd_tpu.models.robot.scene import SCENE_TAGS

    for tag in SCENE_TAGS:
        s = get_scene(tag)
        pts = jnp.zeros((3, 3))
        assert scene_sdf(s, pts).shape == (3,)


def test_occupancy_dataset_balance():
    scene = get_scene("cage")
    pts, labels = sample_occupancy_dataset(scene, jax.random.PRNGKey(0), 2000)
    assert pts.shape == (2000, 3)
    assert 0.0 < labels.mean() < 0.5  # some occupied, mostly free


def test_segment_distance_closed_forms():
    d = segment_distance(
        jnp.asarray([0.0, 0, 0]), jnp.asarray([1.0, 0, 0]),
        jnp.asarray([0.0, 1, 0]), jnp.asarray([1.0, 1, 0]),
    )
    np.testing.assert_allclose(float(d), 1.0, atol=1e-6)
    d = segment_distance(
        jnp.asarray([0.0, 0, 0]), jnp.asarray([1.0, 0, 0]),
        jnp.asarray([2.0, 0, 0]), jnp.asarray([3.0, 0, 0]),
    )
    np.testing.assert_allclose(float(d), 1.0, atol=1e-6)
    # crossing segments
    d = segment_distance(
        jnp.asarray([-1.0, 0, 0]), jnp.asarray([1.0, 0, 0]),
        jnp.asarray([0.0, -1, 0.1]), jnp.asarray([0.0, 1, 0.1]),
    )
    np.testing.assert_allclose(float(d), 0.1, atol=1e-6)


def test_self_collision_labels(robot):
    # clearly free configurations (home pose and variants)
    for q_free in (
        [0.0, -0.785, 0.0, -2.356, 0.0, 1.571, 0.785],  # franka home
        [0.0, -0.3, 0.0, -1.5, 0.0, 1.2, 0.0],
        [1.0, -0.8, 0.5, -2.2, 0.3, 1.6, 0.7],
    ):
        q = jnp.asarray(q_free)
        assert float(self_collision(robot, q)) == 0.0, q_free
        assert float(jnp.min(self_collision_margins(robot, q))) > 0.0
    # arm folded fully back onto the base: clear self-collision
    q_fold = jnp.asarray([0.0, 1.7, 0.0, -2.9, 0.0, 3.6, 0.0])
    assert float(self_collision(robot, q_fold)) == 1.0
    # batched
    qs = jnp.stack([jnp.zeros(7), q_fold])
    assert self_collision(robot, qs).shape == (2,)


def test_path_request_yaml(tmp_path):
    req = PathRequest(start=(0.0,) * 7, target=(0.5,) * 7)
    p = tmp_path / "req.yaml"
    req.to_yaml(p)
    req2 = PathRequest.from_yaml(p)
    assert req2.start == req.start and req2.target == req.target


@pytest.mark.slow
def test_all_scene_tags_build_and_generate_requests():
    """Every scene tag (incl. the four round-2 additions mirroring the
    reference's kitchen/box/bookshelf_thin/table_bars) builds, has a finite
    SDF, and yields collision-free start/goal requests."""
    import jax.numpy as jnp

    from sigsvgd_tpu.experiments.robot_planning import default_requests
    from sigsvgd_tpu.models.robot import PandaRobot
    from sigsvgd_tpu.models.robot.scene import SCENE_TAGS, get_scene, scene_sdf

    robot = PandaRobot.create()
    pts = jnp.asarray([[0.5, 0.0, 0.5], [0.0, 0.0, 1.5], [2.0, 2.0, 2.0]])
    for tag in SCENE_TAGS:
        scene = get_scene(tag)
        sdf = np.asarray(scene_sdf(scene, pts))
        if tag == "empty":
            assert (sdf == np.inf).all()  # no obstacles → infinite clearance
            continue
        assert np.isfinite(sdf).all(), tag
        reqs = default_requests(robot, tag, n=2)
        assert len(reqs) == 2, f"{tag}: could not find free request endpoints"


# ---------------------------------------------------------------------------
# Robodata (MoveIt-format) importer — reference robot_scene.py:203-246,325-385
# ---------------------------------------------------------------------------


def test_moveit_importer_round_trip(tmp_path):
    """Synthetic MoveIt-format fixtures (the reference's published robodata
    format) load verbatim into Scene/PathRequest/trajectory arrays; the
    imported scene's SDF reflects the composed poses."""
    import math

    import yaml

    from sigsvgd_tpu.models.robot import (
        load_moveit_request, load_moveit_scene, load_moveit_trajectory,
    )
    from sigsvgd_tpu.models.robot.scene import scene_sdf

    # 45-degree yaw quaternion [x, y, z, w]
    s, c = math.sin(math.pi / 8), math.cos(math.pi / 8)
    scene_doc = {
        "world": {
            "collision_objects": [
                {
                    "id": "shelf",
                    "pose": {
                        "position": [0.5, 0.0, 0.0],
                        "orientation": [0.0, 0.0, s, c],
                    },
                    "primitives": [
                        {"type": "box", "dimensions": [0.4, 0.2, 0.1]},
                        {"type": "cylinder", "dimensions": [0.6, 0.05]},
                    ],
                    "primitive_poses": [
                        {"position": [0.0, 0.0, 0.3],
                         "orientation": [0.0, 0.0, 0.0, 1.0]},
                        {"position": [0.0, 0.3, 0.3],
                         "orientation": [0.0, 0.0, 0.0, 1.0]},
                    ],
                },
                {
                    "id": "ball",
                    "pose": {
                        "position": [0.0, 0.0, 0.0],
                        "orientation": [0.0, 0.0, 0.0, 1.0],
                    },
                    "primitives": [{"type": "sphere", "dimensions": [0.1]}],
                    "primitive_poses": [
                        {"position": [-0.4, 0.2, 0.5],
                         "orientation": [0.0, 0.0, 0.0, 1.0]},
                    ],
                },
            ]
        }
    }
    spath = tmp_path / "demo-scene0001.yaml"
    spath.write_text(yaml.safe_dump(scene_doc))
    scene = load_moveit_scene(spath)
    assert scene.name == "demo-scene0001"
    assert len(scene.primitives) == 3
    box, cyl, sph = scene.primitives
    assert box.kind == "box" and box.size == (0.4, 0.2, 0.1)
    # MoveIt cylinder dims [height, radius] -> (radius, half_height)
    assert cyl.kind == "cylinder" and cyl.size == (0.05, 0.3)
    # composed pose: base yaw rotates the primitive offset
    np.testing.assert_allclose(box.position, (0.5, 0.0, 0.3), atol=1e-9)
    np.testing.assert_allclose(
        cyl.position,
        (0.5 - 0.3 * math.sin(math.pi / 4), 0.3 * math.cos(math.pi / 4), 0.3),
        atol=1e-9,
    )
    # SDF sanity: the sphere's center is inside, far point outside
    d = np.asarray(scene_sdf(scene, jnp.asarray(
        [[-0.4, 0.2, 0.5], [-0.9, -0.9, 1.4]], jnp.float32)))
    assert d[0] < 0.0 < d[1]

    # request: start joint order differs and includes extra (finger) joints
    req_doc = {
        "start_state": {"joint_state": {
            "name": ["panda_joint2", "panda_joint1", "panda_finger_joint1"],
            "position": [0.2, 0.1, 0.03],
        }},
        "goal_constraints": [{"joint_constraints": [
            {"joint_name": "panda_joint1", "position": 0.5},
            {"joint_name": "panda_joint2", "position": -0.4},
        ]}],
    }
    rpath = tmp_path / "demo-scene0001_request0001.yaml"
    rpath.write_text(yaml.safe_dump(req_doc))
    req = load_moveit_request(rpath, joint_names=["panda_joint1", "panda_joint2"])
    assert req.start == (0.1, 0.2)
    assert req.target == (0.5, -0.4)

    # trajectory with joint reordering
    traj_doc = {"joint_trajectory": {
        "joint_names": ["panda_joint2", "panda_joint1"],
        "points": [
            {"positions": [0.2, 0.1]},
            {"positions": [0.25, 0.15]},
        ],
    }}
    tpath = tmp_path / "demo-scene0001_path0001.yaml"
    tpath.write_text(yaml.safe_dump(traj_doc))
    traj = load_moveit_trajectory(tpath, joint_names=["panda_joint1", "panda_joint2"])
    np.testing.assert_allclose(traj, [[0.1, 0.2], [0.15, 0.25]], atol=1e-7)


def test_moveit_importer_embedded_mesh(tmp_path):
    """Embedded vertex/triangle meshes become posed STL MeshObstacles."""
    import yaml

    from sigsvgd_tpu.models.robot import load_moveit_scene

    verts = [[0.0, 0.0, 0.0], [0.1, 0.0, 0.0], [0.0, 0.1, 0.0], [0.0, 0.0, 0.1]]
    tris = [[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]]
    doc = {"world": {"collision_objects": [{
        "id": "rock",
        "pose": {"position": [0.3, 0.0, 0.2],
                 "orientation": [0.0, 0.0, 0.0, 1.0]},
        "meshes": [{"vertices": verts, "triangles": tris}],
        "mesh_poses": [{"position": [0.0, 0.0, 0.0],
                        "orientation": [0.0, 0.0, 0.0, 1.0]}],
    }]}}
    spath = tmp_path / "mesh-scene0001.yaml"
    spath.write_text(yaml.safe_dump(doc))
    scene = load_moveit_scene(spath, mesh_dir=tmp_path)
    assert len(scene.meshes) == 1
    mo = scene.meshes[0]
    assert mo.position == (0.3, 0.0, 0.2)
    raw = open(mo.path, "rb").read()
    n_tris = int(np.frombuffer(raw[80:84], np.uint32)[0])
    assert n_tris == 4


def test_velocity_limits_match_published_moveit_config():
    """Real-data parity check on the kinematics pipeline: the URDF's
    per-joint velocity limits vs the Panda's published MoveIt
    joint_limits.yaml (both vendored verbatim from the reference assets).
    The reference's own URDF bakes a 10% margin over the MoveIt planning
    limits (2.3925 = 1.1 x 2.1750 etc., exact for all 7 joints) — the test
    pins that relationship so a limit-parsing regression cannot hide."""
    from pathlib import Path

    import yaml

    from sigsvgd_tpu.models.robot.panda import PandaRobot, _find_urdf

    robot = PandaRobot.create()
    cfg_path = (
        Path(_find_urdf(None)).parents[1] / "config" / "joint_limits.yaml"
    )
    cfg = yaml.safe_load(cfg_path.read_text())["joint_limits"]
    expected = np.asarray(
        [cfg[f"panda_joint{i}"]["max_velocity"] for i in range(1, 8)]
    )
    np.testing.assert_allclose(
        np.asarray(robot.velocity_limits()), 1.1 * expected, rtol=1e-6
    )
