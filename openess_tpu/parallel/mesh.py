"""Device mesh + sharding rules — the TPU-native replacement for the
reference's single-GPU limitation (SURVEY.md §2.2).

Axes:
- ``data``  — batch-sharded DP over ICI; gradient all-reduce is implicit in
  jit's partitioning of the summed loss.
- ``model`` — tensor-parallel axis for the wide head channels (ASPP 1280-ch
  concat, 512-d classifier); activations stay batch-sharded while the big
  conv kernels shard on output channels. With ``model=1`` this degenerates to
  pure DP.

Multi-host: call :func:`maybe_init_distributed` before mesh creation; device
order puts ICI-adjacent devices on the fastest-varying axis.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed():
    """jax.distributed init when launched under a multi-host coordinator."""
    if "JAX_COORDINATOR_ADDRESS" in os.environ and jax.process_count() == 1:
        jax.distributed.initialize()


def make_mesh(data: int = -1, model: int = 1) -> Mesh:
    devices = np.asarray(jax.devices())
    n = devices.size
    if data == -1:
        data = n // model
    assert data * model <= n, (data, model, n)
    devices = devices[: data * model]
    return Mesh(devices.reshape(data, model), axis_names=("data", "model"))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Put a host batch onto the mesh, sharded along the data axis."""
    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return {k: put(v) for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


# Param subtrees whose conv kernels are wide enough to shard on the model
# axis (output-channel TP): the DeepLab head's 512-d classifier projection,
# ASPP branch/project convs, and the SemSegE2VID 256/512 1x1 projections.
_TP_KERNEL_MARKERS = (
    "classifier_conv",
    "aspp",
    "decoder_ch256",
    "decoder_ch512",
)


def shard_params_tp(params, mesh: Mesh):
    """Place params: TP-shard marked wide kernels on the last (out-channel)
    dim over the 'model' axis; replicate everything else. With model=1 this
    is plain replication. GSPMD then partitions the matmuls/convs consuming
    these kernels and inserts the reduce-scatter/all-gather collectives."""
    model_n = mesh.shape["model"]

    def place(path, leaf):
        keys = [p.key for p in path if hasattr(p, "key")]
        joined = "/".join(keys)
        is_kernel = keys and keys[-1] == "kernel"
        if (
            model_n > 1
            and is_kernel
            and any(m in joined for m in _TP_KERNEL_MARKERS)
            and leaf.ndim >= 2
            and leaf.shape[-1] % model_n == 0
        ):
            spec = P(*([None] * (leaf.ndim - 1)), "model")
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
