"""Raw-event wire (tpu.wire_format: raw_events) end-to-end: the on-device
voxelization inside the jitted step must match the host-built grid wire, and
the full train/eval steps must run on wire batches.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openess_tpu.config.settings import Settings
from openess_tpu.data.device_voxelize import has_wire, voxelize_wire
from openess_tpu.data.synthetic import SyntheticESS
from openess_tpu.training.build import build_models, trainable_labels
from openess_tpu.training.optim import make_optimizer
from openess_tpu.training.steps import StepBuilder, TrainState

H, W, C, T = 64, 96, 6, 2


def make_settings(**kw):
    s = Settings()
    s.dataset_name_b = "synthetic_events"
    s.img_size_b = (H, W)
    s.semseg_num_classes = C
    s.nr_events_data_b = T
    s.compute_dtype = "float32"
    s.data_augmentation_train = kw.pop("augment", False)
    s.superpixel_size = 20
    for k, v in kw.items():
        setattr(s, k, v)
    s.__post_init__()
    return s


@pytest.fixture(scope="module")
def dataset():
    return SyntheticESS(num_samples=4, height=H, width=W, num_classes=C,
                        num_windows=T)


def test_wire_voxelize_matches_grid_wire(dataset):
    s = make_settings(if_supervised_only=True, config_option="recon2voxel")
    grid = dataset.voxelized_batch([0, 1])["event"]
    wire = dataset.raw_wire_batch([0, 1])
    assert has_wire(wire) and "event" not in wire
    got = np.asarray(voxelize_wire(s, wire))
    assert got.shape == grid.shape
    err = np.abs(got - grid).max() / (np.abs(grid).max() + 1e-9)
    # 1/32-px coord quantization + bf16 matmul accumulation
    assert err < 2e-2, err


def test_wire_steps_match_grid_steps(dataset):
    s = make_settings(if_supervised_only=True, config_option="recon2voxel")
    mset = build_models(s, seed=0)
    labels = trainable_labels(mset, s)
    tx = make_optimizer(s, labels, steps_per_epoch=2)
    sb = StepBuilder(s, mset, tx)
    eval_step = sb.make_eval_step()

    grid_b = jax.tree.map(jnp.asarray, dataset.voxelized_batch([0, 1]))
    wire_b = jax.tree.map(jnp.asarray, dataset.raw_wire_batch([0, 1]))
    pred_g, loss_g = eval_step(mset.params, mset.batch_stats, grid_b)
    pred_w, loss_w = eval_step(mset.params, mset.batch_stats, wire_b)
    assert abs(float(loss_g) - float(loss_w)) < 2e-2 * max(
        1.0, abs(float(loss_g))
    )
    # random-init logits have many near-ties, so small grid deltas flip a
    # few argmaxes; the loss tolerance above is the meaningful bound
    agree = (np.asarray(pred_g) == np.asarray(pred_w)).mean()
    assert agree > 0.9, agree


def test_wire_train_step_learns(dataset):
    s = make_settings(
        if_supervised_only=True, config_option="recon2voxel", augment=True
    )
    mset = build_models(s, seed=0)
    labels = trainable_labels(mset, s)
    tx = make_optimizer(s, labels, steps_per_epoch=2)
    sb = StepBuilder(s, mset, tx)
    step = sb.make_train_step()
    state = TrainState(
        step=jnp.asarray(0), params=mset.params,
        batch_stats=mset.batch_stats, opt_state=tx.init(mset.params),
    )
    batch = jax.tree.map(jnp.asarray, dataset.raw_wire_batch([0, 1]))
    hist = []
    for _ in range(5):
        state, losses = step(state, batch, jax.random.key(0), jnp.asarray(0))
        hist.append(float(losses["semseg_loss"]))
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0], hist


def test_wire_pretrain_frame2voxel(dataset):
    s = make_settings(
        if_pretraining=True, config_option="frame2voxel",
        if_spatial_contrastive=True, if_dense_clip_supervision=True,
    )
    mset = build_models(s, seed=0)
    labels = trainable_labels(mset, s)
    tx = make_optimizer(s, labels, steps_per_epoch=2)
    sb = StepBuilder(s, mset, tx)
    step = sb.make_train_step()
    state = TrainState(
        step=jnp.asarray(0), params=mset.params,
        batch_stats=mset.batch_stats, opt_state=tx.init(mset.params),
    )
    batch = jax.tree.map(jnp.asarray, dataset.raw_wire_batch([0, 1]))
    state, losses = step(state, batch, jax.random.key(0), jnp.asarray(0))
    for k in ("contrastive_nce_loss", "dense_clip_loss"):
        assert np.isfinite(float(losses[k])), k
