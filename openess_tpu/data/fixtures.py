"""On-disk replica dataset trees (exact real DSEC/DDD17 layouts) for tests,
demos, and CI — the instant-test-dataset analog of detectron2's
quick_schedules (SURVEY §4c)."""
import os

import numpy as np
from PIL import Image

import h5py


N_LABELS = 16
EV_TOTAL = 40_000
DUR_US = 2_000_000


def write_dsec_sequence(seq_dir, rng, num_classes=11, compressed=False):
    """``compressed=True`` writes events.h5 with chunked+gzip+shuffle
    datasets — real DSEC files are chunked and blosc-compressed (filter
    32001 via hdf5plugin); gzip exercises the same h5py chunked/filtered
    read path with a filter available in every environment."""
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
    def ckw(arr):
        if not compressed:
            return {}
        return dict(chunks=(min(16384, arr.size),), compression="gzip",
                    compression_opts=4, shuffle=True)

    with h5py.File(seq_dir / "events" / "left" / "events.h5", "w") as f:
        f.create_dataset("events/x", data=x, **ckw(x))
        f.create_dataset("events/y", data=y, **ckw(y))
        f.create_dataset("events/p", data=p, **ckw(p))
        f.create_dataset("events/t", data=t, **ckw(t))
        f.create_dataset("ms_to_idx", data=ms_to_idx, **ckw(ms_to_idx))
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


