"""Validation must score every sample exactly once (reference validates with
``drop_last=False``, base_trainer_ov.py:180,272). The TPU-shaped equivalent
is a padded final batch + per-sample ``valid`` mask — these tests pin both
the loader semantics and that the Trainer's val mIoU matches an unpadded
per-sample numpy computation, with no recompile on the last batch.
"""
import jax
import numpy as np

from openess_tpu.config.settings import Settings
from openess_tpu.data.pipeline import PrefetchLoader
from openess_tpu.data.synthetic import SyntheticESS
from openess_tpu.ops.confusion import (
    confusion_matrix,
    confusion_to_acc,
    confusion_to_iou,
)
from openess_tpu.training.trainer import Trainer

H, W, C, T = 64, 96, 6, 2


class ToyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def get_batch(self, indices):
        return {"idx": np.asarray(indices)}


def test_pad_last_covers_every_sample_once():
    loader = PrefetchLoader(
        ToyDataset(10), 4, shuffle=False, drop_last=False, pad_last=True,
        num_workers=2,
    )
    batches = list(loader)
    assert len(batches) == 3
    seen = []
    for b in batches:
        assert b["idx"].shape == (4,)  # static shapes on every batch
        assert b["valid"].shape == (4,)
        seen.extend(b["idx"][b["valid"]].tolist())
    assert sorted(seen) == list(range(10))
    # padding repeats the last real sample and is marked invalid
    assert batches[-1]["valid"].tolist() == [True, True, False, False]
    assert batches[-1]["idx"].tolist() == [8, 9, 9, 9]


def _make_settings():
    s = Settings()
    s.img_size_b = (H, W)
    s.semseg_num_classes = C
    s.nr_events_data_b = T
    s.compute_dtype = "float32"
    s.data_augmentation_train = False
    s.superpixel_size = 20
    s.if_supervised_only = True
    s.config_option = "frame2recon"
    s.batch_size_b = 2
    s.mesh_data = 1
    s.mesh_model = 1
    s.num_cpu_workers = 1
    s.__post_init__()
    return s


def test_trainer_val_miou_matches_unpadded_numpy():
    s = _make_settings()
    mk = lambda n, seed: SyntheticESS(
        num_samples=n, height=H, width=W, num_classes=C, num_windows=T,
        superpixel_size=20, seed=seed,
    )
    train_ds, val_ds = mk(4, 0), mk(5, 1)  # 5 % 2 != 0: padded final batch
    for ds in (train_ds, val_ds):
        ds.get_batch = lambda idx, ds=ds: ds.voxelized_batch(list(idx))

    trainer = Trainer(s, train_ds, val_ds)
    summary = trainer.val_epoch()
    # static shapes: the padded last batch must not trigger a second compile
    compiled_after_val = trainer.eval_step._cache_size()
    assert compiled_after_val == 1, compiled_after_val

    # reference semantics: every val sample scored exactly once, batch-free
    conf = np.zeros((C, C), np.int64)
    for i in range(len(val_ds)):
        batch = jax.tree.map(jax.numpy.asarray, val_ds.voxelized_batch([i, i]))
        pred, _ = trainer.eval_step(
            trainer.state.params, trainer.state.batch_stats, batch
        )
        conf += np.asarray(
            confusion_matrix(
                np.asarray(pred)[:1], np.asarray(batch["label"])[:1],
                num_classes=C, ignore_label=s.semseg_ignore_label,
            ),
            np.int64,
        )
    miou, _ = confusion_to_iou(conf)
    acc = confusion_to_acc(conf)
    np.testing.assert_array_equal(summary["cm"], conf)
    assert abs(summary["miou"] - miou) < 1e-9
    assert abs(summary["acc"] - acc) < 1e-9
