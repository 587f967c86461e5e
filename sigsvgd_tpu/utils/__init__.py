from . import (  # noqa: F401
    checkpoint,
    config,
    distributions,
    helper,
    math,
    obstacle_map,
    profiling,
    schedulers,
    spaces,
    splines,
    utf,
)
from .spaces import Box  # noqa: F401
