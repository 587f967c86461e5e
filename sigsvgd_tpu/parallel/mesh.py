"""Device-mesh helpers for particle/pair sharding.

The reference has no distributed layer (its only parallelism is
``torch.multiprocessing`` over whole experiments, SURVEY.md §2.2); this module
introduces the TPU-native one: a mesh whose axes shard Stein particles
(data-parallel rollouts) and the signature-kernel pair grid (the N×N Gram),
with XLA collectives over ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Tuple[str, ...] = ("dp",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over the available devices.

    Args:
      axis_sizes: sizes per axis; defaults to all devices on one axis.
      axis_names: e.g. ``("dp",)`` for particle sharding or ``("dp", "sp")``
        for 2-D pair-grid sharding of the Gram matrix.
    """
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = [len(devices)] + [1] * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(tuple(axis_sizes))
    return Mesh(arr, axis_names)


def particle_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (particle) dimension; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
