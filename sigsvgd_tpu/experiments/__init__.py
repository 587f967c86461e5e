import os as _os

import jax as _jax

# Experiment drivers construct fresh score/sampler closures per run (per
# seed, per scene), so each run re-traces its jitted solve; the persistent
# compilation cache makes every retrace after the first a cache hit instead
# of a full XLA compile (the flagship sweep is 540 runs of the same shapes).
_jax.config.update(
    "jax_compilation_cache_dir",
    _os.environ.get("SIGSVGD_JAX_CACHE", "/tmp/sigsvgd_jax_cache"),
)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from . import (  # noqa: F401,E402
    compile_results,
    maze,
    obstacle_field,
    pendulum,
    planning,
    robot_planning,
    verify_trajectory,
)
