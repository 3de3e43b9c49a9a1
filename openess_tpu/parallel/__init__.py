from openess_tpu.parallel.mesh import (
    make_mesh,
    maybe_init_distributed,
    replicate,
    shard_batch,
    shard_params_tp,
)

__all__ = [
    "make_mesh",
    "maybe_init_distributed",
    "replicate",
    "shard_batch",
    "shard_params_tp",
]
