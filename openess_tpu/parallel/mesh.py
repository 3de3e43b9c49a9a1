"""Device mesh + sharding rules — the TPU-native replacement for the
reference's single-GPU limitation (SURVEY.md §2.2).

Axes:
- ``data``  — batch-sharded DP over ICI; gradient all-reduce is implicit in
  jit's partitioning of the summed loss.
- ``model`` — second parallelism axis, used in one of two modes:
  * channel TP (:func:`shard_params_tp`): every wide conv/dense kernel
    shards on its output-channel dim; GSPMD partitions the consuming
    matmuls/convs and inserts the reduce-scatter/all-gather collectives.
  * spatial partitioning (:func:`shard_batch` with ``spatial=True``):
    image-height sharding of the activations themselves — the conv-net
    native way to split COMPUTE (not just params) across chips; GSPMD
    inserts halo exchanges for the conv windows. Params stay replicated.

  With ``model=1`` both degenerate to pure DP.

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


# image-like batch keys -> index of the height dim (after the batch dim)
_SPATIAL_H_DIM = {
    "frame": 1, "recon": 1, "label": 1, "pl": 1, "superpixel": 1,
    "sam_feat": 1,
    "event": 3,  # [B, T, bins, H, W] planar wire format
}


def shard_batch(batch: dict, mesh: Mesh, spatial: bool = False) -> dict:
    """Put a host batch onto the mesh, sharded along the data axis.

    ``spatial=True`` additionally shards the image HEIGHT dim over the
    'model' axis (GSPMD spatial partitioning: conv halo exchanges are
    inserted automatically), splitting per-image compute across chips."""
    model_n = mesh.shape["model"]

    def put(k, x):
        dims = [None] * (x.ndim - 1)
        h = _SPATIAL_H_DIM.get(k)
        if (
            spatial and model_n > 1 and h is not None and x.ndim > h
            and x.shape[h] % model_n == 0
        ):
            dims[h - 1] = "model"
        spec = P("data", *dims)
        return jax.device_put(x, NamedSharding(mesh, spec))

    out = {k: put(k, v) for k, v in batch.items()}
    # Block on the H2D copies (in the prefetch worker, off the step's
    # critical path): the packer's reused wire buffers (native.
    # chunk_events_windows_host(reuse_buffers=True)) may be overwritten as
    # soon as the same worker assembles a later batch.
    return jax.block_until_ready(out)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


# Head-kernel families that TP-shard regardless of width (the DeepLab
# classifier projection, ASPP branch/project convs, SemSegE2VID 256/512
# projections): these are the fattest matmul-like 1x1 convs in the nets.
_TP_KERNEL_MARKERS = (
    "classifier_conv",
    "aspp",
    "decoder_ch256",
    "decoder_ch512",
)

# Minimum output-channel width for blanket kernel TP. Covers the ResNet-50
# backbone's stage-2..4 convs (256/512/1024/2048-out — the bulk of params
# and FLOPs) while leaving narrow stem/early kernels replicated, where the
# collective cost would exceed the compute split.
TP_MIN_OUT_CHANNELS = 256


def shard_params_tp(params, mesh: Mesh, min_out: int = TP_MIN_OUT_CHANNELS):
    """Place params: TP-shard conv/dense kernels on the last (out-channel)
    dim over the 'model' axis — every kernel at least ``min_out`` wide, plus
    the marked head families at any width; replicate everything else. With
    model=1 this is plain replication. GSPMD then partitions the
    matmuls/convs consuming these kernels and inserts the
    reduce-scatter/all-gather collectives."""
    model_n = mesh.shape["model"]

    def place(path, leaf):
        keys = [p.key for p in path if hasattr(p, "key")]
        joined = "/".join(keys)
        is_kernel = keys and keys[-1] == "kernel"
        wide = leaf.ndim >= 2 and (
            leaf.shape[-1] >= max(min_out, 2 * model_n)
            or any(m in joined for m in _TP_KERNEL_MARKERS)
        )
        if (
            model_n > 1
            and is_kernel
            and wide
            and leaf.shape[-1] % model_n == 0
        ):
            spec = P(*([None] * (leaf.ndim - 1)), "model")
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
