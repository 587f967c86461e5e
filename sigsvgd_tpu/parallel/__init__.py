from .mesh import make_mesh, particle_sharding, replicated  # noqa: F401
from .mpf import sharded_mpf_observe  # noqa: F401
from .svgd import (  # noqa: F401
    distributed_median,
    sharded_pathsig_score,
    sharded_svgd_run,
)
from .distributed import global_particle_mesh, init_distributed, make_global_particles  # noqa: F401
