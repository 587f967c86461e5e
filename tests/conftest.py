"""Test configuration: force an 8-device virtual CPU platform.

Tests must not run over the single-chip TPU tunnel (slow, and the bf16 MXU
default breaks fp32 numeric oracles). The container's ``sitecustomize``
imports jax and pins ``jax_platforms=axon`` before any conftest runs, so we
override via ``jax.config`` (env vars are already baked by then). Multi-chip
sharding paths are validated on a virtual 8-device CPU mesh; the driver
separately dry-runs them via ``__graft_entry__.dryrun_multichip``.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
