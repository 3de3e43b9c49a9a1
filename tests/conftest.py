"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-world answer to "multi-node tests without a cluster"
(SURVEY.md §4): sharding/collective code paths compile and execute against
`--xla_force_host_platform_device_count=8` exactly as they would against 8
real chips.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import numpy as np
import pytest

# f32-exact convs/matmuls for oracle comparisons (XLA CPU's default oneDNN
# path introduces ~1e-3 bf16-like error on some conv shapes).
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.default_rng(1205)
