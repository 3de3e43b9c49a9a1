"""On-disk fixture tests for the DSEC / DDD17 readers: tiny synthetic trees
with the exact file layout of the real datasets, exercised end-to-end through
``get_batch`` (events.h5 slicing, rectification, side-channel path
substitution, voxelization, crops)."""
import os

import numpy as np
import pytest
from PIL import Image

import h5py

from openess_tpu.config.settings import Settings


def make_settings(**kw):
    s = Settings()
    for k, v in kw.items():
        setattr(s, k, v)
    s.__post_init__()
    return s


# ---------------------------------------------------------------------------
# DSEC fixture
# ---------------------------------------------------------------------------

N_LABELS = 16
EV_TOTAL = 40_000
DUR_US = 2_000_000


def write_dsec_sequence(seq_dir, rng, num_classes=11):
    h, w = 480, 640
    lh = 440
    (seq_dir / "events" / "left").mkdir(parents=True)
    (seq_dir / "semantic" / "left" / f"{num_classes}classes").mkdir(parents=True)
    for extra in ("images_aligned/left", "reconstructions/left",
                  "pl_fcclip_rgb/left", "sp_sam_rgb/left"):
        (seq_dir / extra).mkdir(parents=True)

    t = np.sort(rng.integers(0, DUR_US, EV_TOTAL)).astype(np.int64)
    x = rng.integers(0, w, EV_TOTAL).astype(np.uint16)
    y = rng.integers(0, h, EV_TOTAL).astype(np.uint16)
    p = rng.integers(0, 2, EV_TOTAL).astype(np.uint8)
    ms_to_idx = np.searchsorted(t, np.arange(DUR_US // 1000 + 1) * 1000)
    with h5py.File(seq_dir / "events" / "left" / "events.h5", "w") as f:
        f.create_dataset("events/x", data=x)
        f.create_dataset("events/y", data=y)
        f.create_dataset("events/p", data=p)
        f.create_dataset("events/t", data=t)
        f.create_dataset("ms_to_idx", data=ms_to_idx)
        f.create_dataset("t_offset", data=np.int64(0))
    rect = np.stack(
        np.meshgrid(np.arange(w), np.arange(h)), axis=-1
    ).astype(np.float32)  # identity rectification [H, W, 2] = (x, y)
    with h5py.File(seq_dir / "events" / "left" / "rectify_map.h5", "w") as f:
        f.create_dataset("rectify_map", data=rect)

    # the real timestamps file has 6 extra leading rows vs the label PNGs
    # (sequence_ov.py:94 trims [6:] then asserts equality)
    ts = np.linspace(200_000, DUR_US - 1000, N_LABELS + 6).astype(np.int64)
    np.savetxt(seq_dir / "semantic" / "semantic_timestamps.txt", ts, fmt="%d")
    ts = ts[6:]
    for i in range(N_LABELS):
        name = f"{i:06d}.png"
        lab = rng.integers(0, num_classes, (lh, w)).astype(np.uint8)
        Image.fromarray(lab).save(
            seq_dir / "semantic" / "left" / f"{num_classes}classes" / name
        )
        img = rng.integers(0, 255, (lh, w, 3)).astype(np.uint8)
        Image.fromarray(img).save(seq_dir / "images_aligned" / "left" / name)
        Image.fromarray(img).save(seq_dir / "reconstructions" / "left" / name)
        Image.fromarray(lab).save(seq_dir / "pl_fcclip_rgb" / "left" / name)
        sp = rng.integers(0, 20, (lh, w)).astype(np.uint8)
        Image.fromarray(sp).save(seq_dir / "sp_sam_rgb" / "left" / name)


@pytest.fixture(scope="module")
def dsec_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dsec")
    rng = np.random.default_rng(7)
    write_dsec_sequence(root / "train" / "zurich_city_00_a", rng)
    write_dsec_sequence(root / "test" / "zurich_city_13_a", rng)
    return root


def test_dsec_event_batch(dsec_root):
    from openess_tpu.data.dsec import DSECDataset

    s = make_settings(
        dataset_name_b="DSEC_events",
        dataset_path_b=str(dsec_root),
        config_option="recon2voxel",
        nr_events_data_b=2,
        nr_events_window_b=500,
        pl_sources="pl_fcclip_rgb",
        superpixel_sources="sp_sam_rgb",
    )
    ds = DSECDataset(s, split="train")
    # 16 labels - 6 (warmup trim) = 10 usable
    assert len(ds) == 10
    batch = ds.get_batch([0, 1])
    assert batch["event"].shape == (2, 2, 440, 640, 5)
    assert batch["recon"].shape == (2, 440, 640, 3)
    assert batch["label"].shape == (2, 440, 640)
    assert batch["pl"].shape == (2, 440, 640)
    assert batch["superpixel"].max() < 20
    # events landed in the grid
    assert np.abs(batch["event"]).sum() > 0
    assert np.isfinite(batch["event"]).all()


def test_dsec_val_split_and_frame_path(dsec_root):
    from openess_tpu.data.dsec import DSECDataset

    s = make_settings(
        dataset_name_b="DSEC_events",
        dataset_path_b=str(dsec_root),
        config_option="frame2recon",
        pl_sources="pl_fcclip_rgb",
        superpixel_sources="",
    )
    ds = DSECDataset(s, split="val")
    # skip_ratio=2 on val (provider.py:70): (16-6)//2+1 = 6
    assert len(ds) == 6
    batch = ds.get_batch([0])
    assert "event" not in batch
    assert batch["frame"].shape == (1, 440, 640, 3)
    assert batch["recon"].shape == (1, 440, 640, 3)
    # val mode: pl is all-ones (sequence_ov.py:346-347)
    assert (batch["pl"] == 1).all()


def test_dsec_slicer_boundary_semantics(dsec_root):
    from openess_tpu.data.event_slicer import EventSlicer

    f = h5py.File(
        dsec_root / "train" / "zurich_city_00_a" / "events" / "left" / "events.h5",
        "r",
    )
    sl = EventSlicer(f)
    ev = sl.get_events(500_000, 700_000)
    assert ev["t"].min() >= 500_000 and ev["t"].max() < 700_000
    all_t = np.asarray(f["events/t"])
    expected = ((all_t >= 500_000) & (all_t < 700_000)).sum()
    assert ev["t"].size == expected
    evn = sl.get_events_fixed_num(700_000, 1000)
    assert evn["t"].size == 1000
    assert evn["t"].max() < 700_000
    f.close()


# ---------------------------------------------------------------------------
# DDD17 fixture
# ---------------------------------------------------------------------------

def write_ddd17_dir(d, rng, n_imgs=6, n_events=20_000):
    (d / "segmentation_masks").mkdir(parents=True)
    (d / "index").mkdir()
    for extra in ("images_aligned", "reconstructions", "pl_fcclip_rgb",
                  "superpixels_sam"):
        (d / extra).mkdir()

    t = np.sort(rng.integers(0, 10_000_000, n_events)).astype(np.int64)
    xyp = np.stack(
        [
            rng.integers(0, 346, n_events),
            rng.integers(0, 260, n_events),
            rng.integers(0, 2, n_events),
        ],
        -1,
    ).astype(np.int16)
    t.reshape(-1, 1).tofile(d / "events.dat.t")
    xyp.tofile(d / "events.dat.xyp")

    img_ts = np.linspace(1_000_000, 9_000_000, n_imgs).astype(np.int64)
    idx = np.searchsorted(t, img_ts)
    idx_before = np.searchsorted(t, img_ts - 50_000)
    index_map = np.stack([img_ts, idx, idx_before], -1)
    np.save(d / "index" / "index_50ms.npy", index_map)

    dname = os.path.basename(str(d))
    for i in range(1, n_imgs + 1):
        mask = rng.integers(0, 6, (200, 346)).astype(np.uint8)
        Image.fromarray(mask).save(d / "segmentation_masks" / f"segmentation_{i:08d}.png")
        # frames/recons are stored already at the working resolution 200x352
        # (the DDD17 loader reads them without resizing, :211-221)
        img = rng.integers(0, 255, (200, 352, 3)).astype(np.uint8)
        if dname in ("dir0", "dir1"):
            Image.fromarray(img).save(d / "images_aligned" / f"img_{i:08d}.png")
            Image.fromarray(mask).save(d / "pl_fcclip_rgb" / f"segmentation_{i:08d}.png")
            Image.fromarray(mask).save(d / "superpixels_sam" / f"img_{i:08d}.png")
        else:
            Image.fromarray(img).save(d / "images_aligned" / f"00{i:08d}.png")
            Image.fromarray(mask).save(d / "pl_fcclip_rgb" / f"00{i:08d}.png")
            Image.fromarray(mask).save(d / "superpixels_sam" / f"00{i:08d}.png")
        Image.fromarray(img).save(d / "reconstructions" / f"segmentation_{i:08d}.png")


@pytest.fixture(scope="module")
def ddd17_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ddd17")
    rng = np.random.default_rng(9)
    for i in range(6):
        write_ddd17_dir(root / f"dir{i}", rng)
    return root


def test_ddd17_event_batch(ddd17_root):
    from openess_tpu.data.ddd17 import DDD17Dataset

    s = make_settings(
        dataset_name_b="DDD17_events",
        dataset_path_b=str(ddd17_root),
        config_option="recon2voxel",
        semseg_num_classes=6,
        nr_events_data_b=2,
        nr_events_window_b=400,
        pl_sources="pl_fcclip_rgb",
        superpixel_sources="sp_sam_rgb",
    )
    ds = DDD17Dataset(s, split="train")
    assert len(ds) == 5 * 6  # 5 train dirs x 6 masks
    batch = ds.get_batch([0, 7])
    assert batch["event"].shape == (2, 2, 200, 352, 5)
    assert batch["label"].shape == (2, 200, 352)
    assert batch["recon"].shape == (2, 200, 352, 3)
    assert np.abs(batch["event"]).sum() > 0


def test_ddd17_valid_split(ddd17_root):
    from openess_tpu.data.ddd17 import DDD17Dataset

    s = make_settings(
        dataset_name_b="DDD17_events",
        dataset_path_b=str(ddd17_root),
        config_option="frame2recon",
        semseg_num_classes=6,
        pl_sources="pl_fcclip_rgb",
        superpixel_sources="",
    )
    ds = DDD17Dataset(s, split="valid")
    assert len(ds) == 6  # dir1 only
    batch = ds.get_batch([0, 1])
    assert batch["frame"].shape == (2, 200, 352, 3)
    assert (batch["pl"] == 1).all()  # valid split: no pseudo-labels
