from .kinematics import fk_poses, fk_positions  # noqa: F401
from .panda import PandaRobot  # noqa: F401
from .robodata import (  # noqa: F401
    load_moveit_request,
    load_moveit_scene,
    load_moveit_trajectory,
)
from .scene import SCENE_TAGS, Scene, get_scene, scene_sdf  # noqa: F401
from .urdf import KinematicChain, parse_urdf  # noqa: F401
