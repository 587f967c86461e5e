"""Multi-host initialization and mesh construction.

The reference has no multi-node story (SURVEY.md §5.8); this module provides
the TPU-native one: ``jax.distributed.initialize`` + a global mesh whose
'dp' (particle) axis spans hosts×chips, so particle/rollout sharding rides
ICI within a slice and DCN across slices with the same ``shard_map`` code
paths as single-host (all code in ``parallel.svgd`` is mesh-shape agnostic).

Single-controller-per-host SPMD: every host runs the same program; arrays
constructed with ``make_global_particles`` are globally sharded.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize multi-host JAX (no-op on a single host).

    On Cloud TPU pods the arguments auto-detect from the environment; for
    manual clusters pass coordinator/num_processes/process_id (or set
    ``JAX_COORDINATOR_ADDRESS`` etc.). Returns the process index.
    """
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes > 1 or coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index()


def global_particle_mesh(
    sp: int = 1, axis_names: Tuple[str, str] = ("dp", "sp")
) -> Mesh:
    """Mesh over ALL devices (all hosts): ``dp = n_devices // sp``.

    The 'dp' axis is laid out so consecutive dp indices stay within a host
    (rollout data-parallelism never crosses DCN; only the small all_gather of
    particles/trajectories does).
    """
    devices = np.asarray(jax.devices())
    assert devices.size % sp == 0
    return Mesh(devices.reshape(devices.size // sp, sp), axis_names)


def make_global_particles(
    key: jax.Array, shape: Sequence[int], mesh: Mesh, axis: str = "dp"
) -> jax.Array:
    """Create a particle array sharded over the global mesh's ``axis``
    (identical values on every host for a given key — generated replicated
    then sharded, fine for initialization-sized arrays)."""
    x = jax.random.normal(key, tuple(shape))
    return jax.device_put(x, NamedSharding(mesh, P(axis)))
