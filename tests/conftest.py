"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-world answer to "multi-node tests without a cluster"
(SURVEY.md §4): sharding/collective code paths compile and execute against
`--xla_force_host_platform_device_count=8` exactly as they would against 8
real chips.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the outer env carries the TPU backend
os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # stop the axon relay registering
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
assert "xla_force_host_platform_device_count" in os.environ["XLA_FLAGS"]

# The axon sitecustomize imports jax at interpreter start and pins the
# platform, so env vars alone are too late — update the live config before
# any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1205)
