"""Observability parity: confusion-matrix plots (viz_utils.py:76-103,
148-176), PCA latent maps (base_trainer_ov.py:558-565), and the trainer's
per-val-epoch dumps into ``vis_dir``."""
import numpy as np

from openess_tpu.utils.viz import (
    confusion_matrix_png,
    image_grid,
    pca_rgb,
)


def test_confusion_matrix_png(tmp_path, rng):
    cm = rng.integers(0, 100, (11, 11)).astype(np.int64)
    p1 = tmp_path / "cm.png"
    p2 = tmp_path / "cm_norm.png"
    confusion_matrix_png(np.asarray(cm), str(p1))
    confusion_matrix_png(
        np.asarray(cm), str(p2), normalize=True,
        class_names=[f"c{i}" for i in range(11)],
    )
    assert p1.stat().st_size > 1000 and p2.stat().st_size > 1000


def test_pca_rgb_separates_structure(rng):
    # two feature clusters -> PCA should map them to distinct colors
    feats = np.zeros((1, 8, 8, 16), np.float32)
    feats[:, :4] = rng.normal(5, 0.1, (1, 4, 8, 16))
    feats[:, 4:] = rng.normal(-5, 0.1, (1, 4, 8, 16))
    out = pca_rgb(feats)
    assert out.shape == (1, 8, 8, 3) and out.dtype == np.uint8
    top = out[0, :4].astype(np.int32).mean(axis=(0, 1))
    bot = out[0, 4:].astype(np.int32).mean(axis=(0, 1))
    assert np.abs(top - bot).max() > 100  # clusters get far-apart colors


def test_image_grid_tiling():
    imgs = np.arange(4 * 5 * 6 * 3, dtype=np.uint8).reshape(4, 5, 6, 3)
    g = image_grid(imgs, nrow=2, pad=1)
    assert g.shape == (2 * 6 - 1, 2 * 7 - 1, 3)
    np.testing.assert_array_equal(g[:5, :6], imgs[0])
    np.testing.assert_array_equal(g[6:, 7:], imgs[3])


class _SyntheticAdapter:
    """get_batch adapter over SyntheticESS for in-process Trainer runs."""

    def __init__(self, ds):
        self.ds = ds

    def __len__(self):
        return len(self.ds)

    def get_batch(self, indices):
        return self.ds.voxelized_batch(list(indices), num_bins=5)


def test_val_epoch_writes_visuals(tmp_path):
    from openess_tpu.config.settings import Settings
    from openess_tpu.data.synthetic import SyntheticESS
    from openess_tpu.training.trainer import Trainer

    s = Settings()
    s.img_size_b = (32, 48)
    s.semseg_num_classes = 6
    s.nr_events_data_b = 2
    s.compute_dtype = "float32"
    s.config_option = "recon2voxel"
    s.if_finetuning = True
    s.if_pretraining = False
    s.batch_size_b = 2
    s.mesh_data = 1
    s.mesh_model = 1
    s.vis_dir = str(tmp_path)
    s.__post_init__()

    ds = SyntheticESS(
        num_samples=2, height=32, width=48, num_classes=6, num_windows=2,
        events_per_window=500,
    )
    trainer = Trainer(s, _SyntheticAdapter(ds), _SyntheticAdapter(ds))
    summary = trainer.val_epoch()
    assert "miou" in summary
    names = {p.name for p in tmp_path.iterdir()}
    for expect in (
        "confusion_e000.png", "confusion_norm_e000.png",
        "semseg_pred_gt_e000.png", "event_preview_e000.png",
        "pca_latent_e000.png",
    ):
        assert expect in names, names
