from . import (  # noqa: F401
    distributions,
    helper,
    math,
    obstacle_map,
    schedulers,
    spaces,
    splines,
    utf,
)
from .spaces import Box  # noqa: F401
