"""Worker for the 2-process jax.distributed test (run via test_distributed).

Each process exposes 2 virtual CPU devices; jax.distributed.initialize
stitches them into one 4-device runtime, the flagship pretrain step jits
over a global {data: 4} mesh, and the (replicated) loss is printed for the
launcher to compare across processes and against the single-process run.
"""
import os
import sys


def main():
    coordinator = sys.argv[1]
    process_id = int(sys.argv[2])

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=2,
        process_id=process_id,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert jax.local_device_count() == 2

    loss = run_flagship_step()
    print(f"DIST_LOSS {loss!r}", flush=True)
    jax.distributed.shutdown()


def make_state_and_batch(mesh):
    """Deterministic model/optimizer state + batch, as GLOBAL arrays.

    Both the distributed workers and the single-process control call this;
    `jax.make_array_from_callback` serves each process's addressable shards
    from the same deterministic host data, so the runs are comparable.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from openess_tpu.config.settings import Settings
    from openess_tpu.data.synthetic import SyntheticESS
    from openess_tpu.training.build import build_models, trainable_labels
    from openess_tpu.training.optim import make_optimizer
    from openess_tpu.training.steps import StepBuilder, TrainState

    H, W, C = 64, 96, 6
    s = Settings()
    s.dataset_name_b = "synthetic_events"
    s.img_size_b = (H, W)
    s.semseg_num_classes = C
    s.nr_events_data_b = 2
    s.compute_dtype = "float32"
    s.if_pretraining = True
    s.config_option = "frame2recon"
    s.if_spatial_contrastive = True
    s.if_dense_clip_supervision = True
    s.superpixel_size = 20
    s.data_augmentation_train = False  # keep the comparison rng-free
    s.__post_init__()

    mset = build_models(s, seed=0)
    labels = trainable_labels(mset, s)
    tx = make_optimizer(s, labels, steps_per_epoch=10)
    sb = StepBuilder(s, mset, tx)
    train_step = sb.make_train_step()

    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("data"))

    def globalize(tree, sharding):
        def put(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(
                x.shape, sharding, lambda idx: x[idx]
            )
        return jax.tree.map(put, tree)

    state = TrainState(
        step=globalize(jnp.asarray(0, jnp.int32), rep),
        params=globalize(mset.params, rep),
        batch_stats=globalize(mset.batch_stats, rep),
        opt_state=globalize(tx.init(mset.params), rep),
    )
    ds = SyntheticESS(num_samples=4, height=H, width=W, num_classes=C,
                      num_windows=2, superpixel_size=20)
    batch = globalize(ds.voxelized_batch([0, 1, 2, 3]), dp)
    return train_step, state, batch


def run_flagship_step():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    import numpy as np

    devices = np.asarray(jax.devices()[:4]).reshape(4, 1)
    mesh = Mesh(devices, axis_names=("data", "model"))
    train_step, state, batch = make_state_and_batch(mesh)
    state, losses = train_step(state, batch, jax.random.key(0),
                               jnp.asarray(0))
    return float(losses["total_loss"])


if __name__ == "__main__":
    main()
