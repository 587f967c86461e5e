from .base import DynamicsModel, ParamsDict  # noqa: F401
from .cartpole import CartPoleModel  # noqa: F401
from .particle import ParticleModel  # noqa: F401
from .pendulum import PendulumModel  # noqa: F401
from .rollout import rollout  # noqa: F401
from .skid_steer import SkidSteerModel  # noqa: F401
from .toy import DoubleBanana, Sine, StarGaussian, star_gaussian  # noqa: F401
