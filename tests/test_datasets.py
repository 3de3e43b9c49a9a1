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

from openess_tpu.data.fixtures import (  # noqa: F401
    DUR_US,
    EV_TOTAL,
    N_LABELS,
    write_ddd17_dir,
    write_dsec_sequence,
)


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
        wire_format="grid",
    )
    ds = DSECDataset(s, split="train")
    # 16 labels - 6 (warmup trim) = 10 usable
    assert len(ds) == 10
    batch = ds.get_batch([0, 1])
    assert batch["event"].shape == (2, 2, 5, 440, 640)  # planar wire format
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
        wire_format="grid",
    )
    ds = DDD17Dataset(s, split="train")
    assert len(ds) == 5 * 6  # 5 train dirs x 6 masks
    batch = ds.get_batch([0, 7])
    assert batch["event"].shape == (2, 2, 5, 200, 352)  # planar wire format
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


def test_dsec_histogram_representation(dsec_root):
    """event_representation: histogram -> 2-channel count maps
    (data_util.py:17-35), same crop/window contract as the voxel path."""
    from openess_tpu.data.dsec import DSECDataset

    s = make_settings(
        dataset_name_b="DSEC_events",
        dataset_path_b=str(dsec_root),
        config_option="recon2voxel",
        nr_events_data_b=2,
        nr_events_window_b=500,
        event_representation_b="histogram",
        pl_sources="pl_fcclip_rgb",
        superpixel_sources="sp_sam_rgb",
    )
    assert s.input_channels_b == 2
    ds = DSECDataset(s, split="train")
    batch = ds.get_batch([0, 1])
    assert batch["event"].shape == (2, 2, 2, 440, 640)
    assert (batch["event"] >= 0).all()  # counts
    assert batch["event"].sum() > 0


def test_ddd17_histogram_representation(ddd17_root):
    from openess_tpu.data.ddd17 import DDD17Dataset

    s = make_settings(
        dataset_name_b="DDD17_events",
        dataset_path_b=str(ddd17_root),
        config_option="frame2voxel",
        semseg_num_classes=6,
        nr_events_data_b=2,
        event_representation_b="histogram",
        pl_sources="pl_fcclip_rgb",
        superpixel_sources="",
    )
    assert s.input_channels_b == 2
    ds = DDD17Dataset(s, split="train")
    batch = ds.get_batch([0, 1])
    assert batch["event"].shape == (2, 2, 2, 200, 352)
    assert batch["event"].sum() != 0


def test_histogram_batch_trains(dsec_root):
    """The histogram representation flows through the full event train
    step (e2vid input channels follow input_channels_b)."""
    import jax
    import jax.numpy as jnp

    from openess_tpu.data.dsec import DSECDataset
    from openess_tpu.training.build import build_models, trainable_labels
    from openess_tpu.training.optim import make_optimizer
    from openess_tpu.training.steps import StepBuilder, TrainState

    s = make_settings(
        dataset_name_b="DSEC_events",
        dataset_path_b=str(dsec_root),
        config_option="recon2voxel",
        if_finetuning=True,
        nr_events_data_b=2,
        nr_events_window_b=500,
        event_representation_b="histogram",
        img_size_b=(64, 96),
        compute_dtype="float32",
        pl_sources="pl_fcclip_rgb",
        superpixel_sources="sp_sam_rgb",
    )
    mset = build_models(s, seed=0)
    tx = make_optimizer(s, trainable_labels(mset, s), steps_per_epoch=2)
    sb = StepBuilder(s, mset, tx)
    step = sb.make_train_step()
    state = TrainState(
        step=jnp.asarray(0), params=mset.params,
        batch_stats=mset.batch_stats, opt_state=tx.init(mset.params),
    )
    rng = np.random.default_rng(3)
    batch = {
        "event": rng.poisson(0.1, (2, 2, 2, 64, 96)).astype(np.float32),
        "label": rng.integers(0, 11, (2, 64, 96)).astype(np.int32),
        "pl": rng.integers(0, 11, (2, 64, 96)).astype(np.int32),
        "superpixel": rng.integers(0, 20, (2, 64, 96)).astype(np.int32),
    }
    batch = jax.tree.map(jnp.asarray, batch)
    state, losses = step(state, batch, jax.random.key(0), jnp.asarray(0))
    assert np.isfinite(float(losses["total_loss"]))


def test_dsec_device_voxelizer_matches_host(dsec_root):
    """host_voxelize=False (device scatter / Pallas MXU on TPU) produces the
    same planar [B, T, bins, H, W] batch as the native host path."""
    from openess_tpu.data.dsec import DSECDataset

    kw = dict(
        dataset_name_b="DSEC_events",
        dataset_path_b=str(dsec_root),
        config_option="recon2voxel",
        nr_events_data_b=2,
        nr_events_window_b=500,
        pl_sources="pl_fcclip_rgb",
        superpixel_sources="sp_sam_rgb",
    )
    kw["wire_format"] = "grid"
    host = DSECDataset(make_settings(**kw), split="train").get_batch([0, 1])
    s2 = make_settings(host_voxelize=False, **kw)
    dev = DSECDataset(s2, split="train").get_batch([0, 1])
    assert dev["event"].shape == host["event"].shape == (2, 2, 5, 440, 640)
    np.testing.assert_allclose(dev["event"], host["event"], atol=1e-4)


def test_ddd17_device_voxelizer_matches_host(ddd17_root):
    from openess_tpu.data.ddd17 import DDD17Dataset

    kw = dict(
        dataset_name_b="DDD17_events",
        dataset_path_b=str(ddd17_root),
        config_option="frame2voxel",
        semseg_num_classes=6,
        nr_events_data_b=2,
        pl_sources="pl_fcclip_rgb",
        superpixel_sources="",
    )
    kw["wire_format"] = "grid"
    host = DDD17Dataset(make_settings(**kw), split="train").get_batch([0, 1])
    dev = DDD17Dataset(
        make_settings(host_voxelize=False, **kw), split="train"
    ).get_batch([0, 1])
    assert dev["event"].shape == host["event"].shape
    np.testing.assert_allclose(dev["event"], host["event"], atol=1e-3)


def test_dsec_raw_wire_matches_host_grid(dsec_root):
    """The production raw-event wire (tpu.wire_format default) voxelized
    on-device must match the host grid wire built from the same events."""
    from openess_tpu.data.device_voxelize import voxelize_wire
    from openess_tpu.data.dsec import DSECDataset

    kw = dict(
        dataset_name_b="DSEC_events",
        dataset_path_b=str(dsec_root),
        config_option="recon2voxel",
        nr_events_data_b=2,
        nr_events_window_b=500,
        pl_sources="pl_fcclip_rgb",
        superpixel_sources="sp_sam_rgb",
    )
    host = DSECDataset(
        make_settings(wire_format="grid", **kw), split="train"
    ).get_batch([0, 1])
    s_raw = make_settings(**kw)
    assert s_raw.wire_format == "raw_events"  # the production default
    wire = DSECDataset(s_raw, split="train").get_batch([0, 1])
    assert "event" not in wire and "ev_x" in wire
    got = np.asarray(voxelize_wire(s_raw, wire))
    ref = host["event"]
    assert got.shape == ref.shape == (2, 2, 5, 440, 640)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-2, err  # 1/32-px quantization + bf16 accumulation


def test_ddd17_raw_wire_matches_host_grid(ddd17_root):
    from openess_tpu.data.device_voxelize import voxelize_wire
    from openess_tpu.data.ddd17 import DDD17Dataset

    kw = dict(
        dataset_name_b="DDD17_events",
        dataset_path_b=str(ddd17_root),
        config_option="frame2voxel",
        semseg_num_classes=6,
        nr_events_data_b=2,
        separate_pol_b=True,
        normalize_event_b=True,
        pl_sources="pl_fcclip_rgb",
        superpixel_sources="",
    )
    host = DDD17Dataset(
        make_settings(wire_format="grid", **kw), split="train"
    ).get_batch([0, 1])
    s_raw = make_settings(**kw)
    wire = DDD17Dataset(s_raw, split="train").get_batch([0, 1])
    assert "event" not in wire and "ev_x" in wire
    got = np.asarray(voxelize_wire(s_raw, wire))
    ref = host["event"]
    assert got.shape == ref.shape == (2, 2, 10, 200, 352)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-2, err


def test_event_file_readers(tmp_path):
    """Generic .txt/.zip event-stream windowing (e2vid/utils/
    event_readers.py semantics): fixed-count chunks and fixed-duration
    windows that close when an event exceeds first_stamp + duration."""
    import zipfile

    from openess_tpu.data.event_file_readers import (
        fixed_duration_event_windows,
        fixed_size_event_windows,
    )

    # 10 events at t = 0.00, 0.01, ..., 0.09 s
    lines = ["240 180"] + [
        f"{i/100:.6f} {i} {i * 2} {i % 2}" for i in range(10)
    ]
    txt = tmp_path / "events.txt"
    txt.write_text("\n".join(lines) + "\n")

    wins = list(fixed_size_event_windows(str(txt), num_events=4))
    assert [w.shape[0] for w in wins] == [4, 4, 2]
    np.testing.assert_allclose(wins[0][:, 0], [0.0, 0.01, 0.02, 0.03])
    np.testing.assert_allclose(wins[1][0], [0.04, 4, 8, 0])

    # 25 ms windows: the boundary event closes AND belongs to the window
    # (reference appends before the duration check); trailing partials drop
    wins = list(fixed_duration_event_windows(str(txt), duration_ms=25.0))
    assert [w.shape[0] for w in wins] == [4, 3, 3]
    np.testing.assert_allclose(wins[0][:, 0], [0.0, 0.01, 0.02, 0.03])
    np.testing.assert_allclose(wins[1][:, 0], [0.04, 0.05, 0.06])
    np.testing.assert_allclose(wins[2][:, 0], [0.07, 0.08, 0.09])

    # zip flavor
    zp = tmp_path / "events.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.write(txt, "events.txt")
    wins_zip = list(fixed_duration_event_windows(str(zp), duration_ms=25.0))
    assert len(wins_zip) == 3
    np.testing.assert_allclose(wins_zip[0], wins[0])


def test_dsec_fixed_duration_windows(dsec_root):
    """fixed_duration mode (sequence_ov.py duration branch): T windows of
    delta_t_per_data ms each, ending at the label timestamp; each window
    holds exactly the slicer's events for its time span (tail-truncated to
    the window capacity K)."""
    from openess_tpu.data.dsec import DSECDataset

    T, delta_ms, K = 2, 50, 500
    s = make_settings(
        dataset_name_b="DSEC_events",
        dataset_path_b=str(dsec_root),
        config_option="recon2voxel",
        nr_events_data_b=T,
        nr_events_window_b=K,
        fixed_duration_b=True,
        delta_t_per_data_b=delta_ms,
        pl_sources="pl_fcclip_rgb",
        superpixel_sources="sp_sam_rgb",
        wire_format="grid",
    )
    ds = DSECDataset(s, split="train")
    seq = ds.sequences[0]
    delta_us = delta_ms * 1000
    for index in (0, len(seq) - 1):
        ts_end = int(seq.timestamps[index])
        ts_start = ts_end - T * delta_us
        x, y, p, t, valid = seq.load_events(index)
        assert x.shape == (T, K)
        for i in range(T):
            lo, hi = ts_start + i * delta_us, ts_start + (i + 1) * delta_us
            tv = t[i][valid[i]]
            assert tv.size > 0
            assert tv.min() >= lo and tv.max() < hi, (tv.min(), tv.max(), lo, hi)
            ev = seq.slicer.get_events(lo, hi)
            n_ref = ev["t"].size
            assert valid[i].sum() == min(n_ref, K)
            # tail-take: the window keeps the LAST K events of its span
            np.testing.assert_array_equal(tv, ev["t"][-min(n_ref, K):])
    # batches voxelize finitely through the standard path
    batch = ds.get_batch([0])
    assert np.isfinite(batch["event"]).all()
    assert np.abs(batch["event"]).sum() > 0


def test_dsec_compressed_events_h5(dsec_root, tmp_path):
    """Real DSEC events.h5 files are chunked + compressed (blosc via
    hdf5plugin). A gzip+shuffle+chunked fixture exercises the same h5py
    filtered-read path with a universally available filter: every slicer
    query must be bit-identical to the uncompressed fixture
    (DSEC/utils/eventslicer.py:32-98)."""
    from openess_tpu.data.event_slicer import EventSlicer
    from openess_tpu.data.fixtures import write_dsec_sequence

    rng = np.random.default_rng(7)  # same seed as dsec_root
    croot = tmp_path / "dsec_compressed"
    write_dsec_sequence(
        croot / "train" / "zurich_city_00_a", rng, compressed=True
    )
    rel = "train/zurich_city_00_a/events/left/events.h5"
    with h5py.File(dsec_root / rel, "r") as fu, h5py.File(
        croot / rel, "r"
    ) as fc:
        assert fc["events/t"].compression == "gzip"  # fixture really is
        su, sc = EventSlicer(fu), EventSlicer(fc)
        assert su.get_final_time_us() == sc.get_final_time_us()
        for lo, hi in ((0, 1), (500_000, 700_000), (1_999_000, 2_000_000)):
            eu, ec = su.get_events(lo, hi), sc.get_events(lo, hi)
            for k in ("p", "x", "y", "t"):
                np.testing.assert_array_equal(eu[k], ec[k])
        for t_end in (1_000, 700_000, 1_999_999):
            eu = su.get_events_fixed_num(t_end, 1000)
            ec = sc.get_events_fixed_num(t_end, 1000)
            for k in ("p", "x", "y", "t"):
                np.testing.assert_array_equal(eu[k], ec[k])


def test_dsec_missing_filter_fails_loudly(tmp_path, monkeypatch):
    """A dataset whose reads raise (e.g. blosc data without hdf5plugin)
    must fail at EventSlicer construction with an error that names
    hdf5plugin — not with a bare h5py OSError mid-epoch."""
    import openess_tpu.data.event_slicer as es

    path = tmp_path / "events.h5"
    with h5py.File(path, "w") as f:
        f.create_dataset("events/x", data=np.zeros(4, np.uint16))
        f.create_dataset("events/y", data=np.zeros(4, np.uint16))
        f.create_dataset("events/p", data=np.zeros(4, np.uint8))
        f.create_dataset("events/t", data=np.arange(4, dtype=np.int64))
        f.create_dataset("ms_to_idx", data=np.zeros(2, np.int64))

    class _Raising:
        def __init__(self, d):
            self._d = d

        def __getitem__(self, k):
            raise OSError("Can't read data (required filter 32001 missing)")

    with h5py.File(path, "r") as f:
        wrapped = {
            "events/t": _Raising(f["events/t"]),
            "events/x": f["events/x"],
            "events/y": f["events/y"],
            "events/p": f["events/p"],
            "ms_to_idx": f["ms_to_idx"],
        }

        class _F:
            filename = str(path)

            def __getitem__(self, k):
                return wrapped[k]

            def keys(self):
                return wrapped.keys()

        with pytest.raises(RuntimeError, match="hdf5plugin"):
            es.EventSlicer(_F())


def test_dsec_fixed_num_boundary_goldens(dsec_root):
    """``get_events_fixed_num`` lookback semantics at file start/end against
    a pure-numpy golden on the full arrays (eventslicer.py:68-98):
    - near file start the lookback clamps to index 0 (shorter window, never
      wraps or raises);
    - t_end past the ms_to_idx table returns None;
    - exact-millisecond t_end (empty conservative slice) still lands on the
      first index with t >= t_end."""
    from openess_tpu.data.event_slicer import EventSlicer
    from openess_tpu.data.fixtures import DUR_US

    with h5py.File(
        dsec_root / "train" / "zurich_city_00_a" / "events" / "left"
        / "events.h5",
        "r",
    ) as f:
        sl = EventSlicer(f)
        all_t = np.asarray(f["events/t"])

        def golden(t_end, n):
            end = int(np.searchsorted(all_t, t_end, side="left"))
            return max(end - n, 0), end

        # sweep: file start, exact-ms boundaries, interior, last valid ms
        for t_end in (1, 999, 1_000, 1_001, 50_000, 1_000_000,
                      DUR_US - 1, DUR_US):
            for n in (10, 1_000, 10**9):
                ev = sl.get_events_fixed_num(t_end, n)
                lo, hi = golden(t_end, n)
                assert ev is not None, (t_end, n)
                assert ev["t"].size == hi - lo, (t_end, n)
                np.testing.assert_array_equal(ev["t"], all_t[lo:hi])
                assert ev["t"].size == ev["x"].size == ev["y"].size

        # lookback clamp at file start: fewer than n events, starting at 0
        ev = sl.get_events_fixed_num(1_000, 10**9)
        assert ev["t"].size == int(np.searchsorted(all_t, 1_000))
        # past the ms_to_idx table: loud None, matching the reference
        assert sl.get_events_fixed_num(DUR_US + 1_000, 10) is None
