from .mesh import make_mesh, particle_sharding, replicated  # noqa: F401
from .svgd import (  # noqa: F401
    distributed_median,
    sharded_pathsig_score,
    sharded_svgd_run,
)
