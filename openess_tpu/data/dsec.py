"""DSEC-Semantic dataset (reference: DSEC/dataset/sequence_ov.py,
DSEC/dataset/provider.py, datasets/DSEC_events_loader.py).

Host side reads h5 events + PNG side-channels. Event delivery, by
``tpu.wire_format``:
- ``raw_events`` (production default): the host counting-sorts events into
  the compact sorted-chunk wire (ev_* keys, 9 B/event — see
  data/device_voxelize.py) and the jitted step voxelizes on-device at
  ~1.2 Gev/s;
- ``grid``: host voxelization (native C++ batched kernel, or a device
  pre-pass) shipping planar [B,T,bins,H,W] grids — the reference's
  per-sample 8-thread joblib fan-out (sequence_ov.py:304-305) equivalent.

Common sample contract (per ``get_batch``, training/steps.py):
  frame / recon [B,H,W,3] / label / pl / superpixel [B,H,W] int32 /
  sam_feat [B,64,64,256].
"""
from __future__ import annotations

import functools
import os
import threading
from pathlib import Path
from typing import Optional

import numpy as np
from PIL import Image

import h5py

from openess_tpu.config.settings import Settings
from openess_tpu.data.event_slicer import EventSlicer

TRAIN_SEQUENCES = [
    "zurich_city_00_a", "zurich_city_01_a", "zurich_city_02_a",
    "zurich_city_04_a", "zurich_city_05_a", "zurich_city_06_a",
    "zurich_city_07_a", "zurich_city_08_a",
]  # provider.py:38-42
VAL_SEQUENCES = ["zurich_city_13_a", "zurich_city_14_c", "zurich_city_15_a"]


@functools.lru_cache(maxsize=4)
def _device_voxelizer(num_windows, num_bins, height, width, normalize,
                      crop_bottom):
    """Device voxelization, returning the planar [B, T, bins, H, W] wire
    format directly. On TPU the scatter-free Pallas MXU kernel
    (ops/voxelize_mxu.py, ~2.6x the XLA scatter) is used; elsewhere the
    bit-exact scatter path."""
    import jax

    from openess_tpu.ops import (
        normalize_nonzero,
        voxelize_windows_trilinear,
        voxelize_windows_trilinear_mxu,
    )

    # the Pallas kernel uses TPU-specific memory spaces; other accelerators
    # fall back to the portable XLA scatter path
    use_mxu = jax.default_backend() == "tpu"

    @jax.jit
    def run(x, y, p, t, valid):  # each [B, T*K]
        def one(args):
            if use_mxu:
                g = voxelize_windows_trilinear_mxu(
                    *args, num_windows=num_windows, num_bins=num_bins,
                    height=height, width=width,
                )
                if normalize:
                    g = jax.vmap(
                        lambda w: normalize_nonzero(w, unbiased=True)
                    )(g.reshape(num_windows, num_bins, height, width))
                    g = g.reshape(num_windows * num_bins, height, width)
                return g
            return voxelize_windows_trilinear(
                *args, num_windows=num_windows, num_bins=num_bins,
                height=height, width=width, normalize=normalize,
            )
        grids = jax.vmap(one)((x, y, p, t, valid))  # [B, T*bins, H, W]
        if crop_bottom:
            grids = grids[:, :, :-crop_bottom, :]
        b = grids.shape[0]
        h = grids.shape[2]
        # planar [B, T, bins, h, W] — a contiguous reshape, no transpose
        return grids.reshape(b, num_windows, num_bins, h, width)

    return run


class DSECSequence:
    """One recording (sequence_ov.py:25-210): label list with 250 ms warm-up
    trim and skip_ratio subsetting, events.h5 slicer, rectify map, PNG
    side-channel path substitution."""

    HEIGHT, WIDTH = 480, 640

    def __init__(self, seq_path: Path, mode: str, s: Settings, skip_ratio: int):
        self.seq_path = Path(seq_path)
        self.mode = mode
        self.s = s
        self.num_classes = s.semseg_num_classes
        remove_time_window = 250

        ts_file = self.seq_path / "semantic" / "semantic_timestamps.txt"
        self.timestamps = np.loadtxt(str(ts_file), dtype="int64")[6:]

        label_dir = (
            self.seq_path / "semantic" / "left" / f"{self.num_classes}classes"
        )
        labels = sorted(
            str(e) for e in label_dir.iterdir() if e.name.endswith(".png")
        )
        assert len(labels) == self.timestamps.size, (len(labels), self.timestamps.size)

        trim = (remove_time_window // 100 + 1) * 2  # sequence_ov.py:114-115
        self.timestamps = self.timestamps[trim:]
        labels = labels[trim:]

        if skip_ratio != 1:  # sequence_ov.py:118-123
            new_len = len(labels) // skip_ratio
            self.timestamps = self.timestamps[: new_len + 1]
            labels = labels[: new_len + 1]
        self.label_paths = labels

        ev_dir = self.seq_path / "events" / "left"
        self._h5f = h5py.File(str(ev_dir / "events.h5"), "r")
        self.slicer = EventSlicer(self._h5f)
        # h5py handles are not safe for concurrent reads; the PrefetchLoader
        # may assemble several batches at once, so serialize slicer access
        # (the expensive voxelization stays parallel)
        self._h5_lock = threading.Lock()
        with h5py.File(str(ev_dir / "rectify_map.h5"), "r") as f:
            self.rectify_map = f["rectify_map"][()]  # [480, 640, 2]

    def __len__(self):
        return self.timestamps.size

    # ---------------- raw event loading ----------------

    def load_events(self, index):
        """Padded (x, y, p, t, valid) arrays, already rectified, split into
        ``nr_events_data`` equal windows of ``nr_events_window`` capacity
        (sequence_ov.py:281-305 semantics: the loaded events are divided into
        T equal-count chunks; trailing remainder is dropped)."""
        s = self.s
        T, K = s.nr_events_data_b, s.nr_events_window_b
        ts_end = int(self.timestamps[index])

        if s.fixed_duration_b:
            delta_us = T * s.delta_t_per_data_b * 1000
            ts_start = ts_end - delta_us
            per = delta_us / T
            chunks = []
            with self._h5_lock:
                for i in range(T):
                    ev = self.slicer.get_events(
                        int(ts_start + i * per), int(ts_start + (i + 1) * per)
                    )
                    chunks.append(ev if ev is not None else None)
        else:
            with self._h5_lock:
                ev = self.slicer.get_events_fixed_num(ts_end, T * K)
            n_loaded = ev["t"].size
            per = n_loaded // T
            chunks = [
                {k: v[i * per : (i + 1) * per] for k, v in ev.items()}
                for i in range(T)
            ]

        x = np.zeros((T, K), np.float32)
        y = np.zeros((T, K), np.float32)
        p = np.zeros((T, K), np.float32)
        t = np.zeros((T, K), np.float64)
        valid = np.zeros((T, K), bool)
        for i, ev in enumerate(chunks):
            if ev is None or ev["t"].size == 0:
                continue
            n = min(ev["t"].size, K)
            xi = ev["x"][-n:].astype(np.int64)
            yi = ev["y"][-n:].astype(np.int64)
            rect = self.rectify_map[yi, xi]  # sequence_ov.py:204-210
            x[i, :n] = rect[:, 0]
            y[i, :n] = rect[:, 1]
            p[i, :n] = ev["p"][-n:]
            t[i, :n] = ev["t"][-n:]
            # pad timestamps with the last valid time so per-window
            # normalization (t_first/t_last over valid only) is unaffected
            t[i, n:] = t[i, n - 1] if n > 0 else 0
            valid[i, :n] = True
        # t stays float64: µs timestamps overflow f32 precision; consumers
        # that want f32 (the host grid voxelizer) cast after windowing
        return x, y, p, t, valid

    # ---------------- side channels ----------------

    @staticmethod
    def _img(path) -> np.ndarray:
        arr = np.asarray(Image.open(path), dtype=np.float32) / 255.0
        if arr.ndim == 2:
            arr = np.repeat(arr[..., None], 3, axis=-1)
        return arr[..., :3]

    def load_sample(self, index) -> dict:
        s = self.s
        file_path = self.label_paths[index]
        label = np.asarray(Image.open(file_path)).astype(np.int32)
        out = {"label": label, "file_path": file_path}
        cls_dir = f"{self.num_classes}classes/"

        opt = s.config_option
        if opt in ("frame2voxel", "frame2recon"):
            fp = file_path.replace("/semantic/left/", "/images_aligned/left/")
            fp = fp.split("left/")[0] + "left/" + os.path.basename(file_path)
            out["frame"] = self._img(fp)
        if opt in ("recon2voxel", "frame2recon"):
            rp = file_path.replace("/semantic/left/", "/reconstructions/left/")
            rp = rp.split("left/")[0] + "left/" + os.path.basename(file_path)
            out["recon"] = self._img(rp)

        if self.mode == "train" and s.pl_sources:
            pp = file_path.replace("semantic/", s.pl_sources + "/")
            pp = pp.replace(cls_dir, "")
            out["pl"] = np.asarray(Image.open(pp)).astype(np.int32)
        else:
            out["pl"] = np.ones_like(label)

        if len(s.superpixel_sources) > 1:
            sp = file_path.replace("semantic/", s.superpixel_sources + "/")
            sp = sp.replace(cls_dir, "")
            if s.superpixel_sources.split("_")[1] == "slic":
                sp = sp.replace(".png", "_slic_100.png")
            out["superpixel"] = np.asarray(Image.open(sp)).astype(np.int32)
        else:
            out["superpixel"] = np.ones_like(label)

        out["sam_feat"] = np.ones((64, 64, 256), np.float32)  # sequence_ov.py:360
        return out


class DSECDataset:
    """Concat of sequences with the reference's train/val namelists
    (provider.py:36-72; val uses skip_ratio=2 and no superpixels)."""

    def __init__(self, s: Settings, split: str = "train"):
        self.s = s
        self.split = split
        root = Path(s.dataset_path_b)
        if split == "train":
            base, names, skip = root / "train", TRAIN_SEQUENCES, s.skip_ratio
        else:
            base, names, skip = root / "test", VAL_SEQUENCES, 2
        self.sequences = []
        for child in sorted(base.iterdir()):
            if any(k in str(child) for k in names):
                self.sequences.append(DSECSequence(child, split, s, skip))
        assert self.sequences, f"no sequences under {base}"
        lens = [len(q) for q in self.sequences]
        self._offsets = np.cumsum([0] + lens)

    def __len__(self):
        return int(self._offsets[-1])

    def _locate(self, idx):
        si = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        return self.sequences[si], idx - self._offsets[si]

    def get_batch(self, indices) -> dict:
        s = self.s
        needs_events = s.config_option in ("recon2voxel", "frame2voxel")
        samples, ev = [], []
        for idx in indices:
            seq, li = self._locate(int(idx))
            samples.append(seq.load_sample(li))
            if needs_events:
                ev.append(seq.load_events(li))

        batch = {}
        for key in ("frame", "recon", "label", "pl", "superpixel", "sam_feat"):
            if key in samples[0]:
                batch[key] = np.stack([sm[key] for sm in samples])
        if needs_events:
            T, K = s.nr_events_data_b, s.nr_events_window_b
            H, W = DSECSequence.HEIGHT, DSECSequence.WIDTH
            bins = s.nr_temporal_bins_b
            if s.event_representation_b == "histogram":
                # 2-channel count histogram (data_util.py:17-35), same
                # window/crop contract as the voxel path
                from openess_tpu.native import event_histogram_windows_host

                B = len(ev)
                x = np.stack([e[0] for e in ev]).reshape(B * T, K)
                y = np.stack([e[1] for e in ev]).reshape(B * T, K)
                pp = np.stack([e[2] for e in ev]).reshape(B * T, K)
                counts = (
                    np.stack([e[4] for e in ev])
                    .reshape(B * T, K)
                    .sum(axis=1)
                    .astype(np.int64)
                )
                grids = event_histogram_windows_host(
                    x, y, pp, counts, H, W,
                    norm_mode=1 if s.normalize_event_b else 0,
                    n_threads=s.num_cpu_workers,
                )
                batch["event"] = (
                    grids[:, :, : H - 40].reshape(B, T, 2, H - 40, W)
                )
            elif s.wire_format == "raw_events":
                # production wire: compact sorted-chunk event streams
                # (trimmed to the bucketed batch-max chunk count); the
                # jitted step voxelizes on-device (data/device_voxelize.py)
                from openess_tpu.data.device_voxelize import wire_reuse_ok
                from openess_tpu.native import chunk_events_windows_host

                B = len(ev)
                wire = chunk_events_windows_host(
                    np.stack([e[0] for e in ev]).reshape(B * T, K),
                    np.stack([e[1] for e in ev]).reshape(B * T, K),
                    np.stack([e[2] for e in ev]).reshape(B * T, K),
                    np.stack([e[3] for e in ev]).reshape(B * T, K),
                    np.stack([e[4] for e in ev]).reshape(B * T, K),
                    height=H, width=W, n_threads=s.num_cpu_workers,
                    reuse_buffers=wire_reuse_ok(), t16=s.wire_t16,
                )
                from openess_tpu.data.device_voxelize import pack_wire_batch

                batch.update(pack_wire_batch(wire, B, T))
            elif s.host_voxelize:
                # one native call voxelizes all B*T windows, parallel across
                # windows (num_cpu_workers threads), with the nonzero
                # normalization + 40-row crop fused in; planar CHW output
                # is the TPU wire format AND skips the host transpose
                from openess_tpu.native import voxelize_trilinear_windows_host

                B = len(ev)
                x = np.stack([e[0] for e in ev]).reshape(B * T, K)
                y = np.stack([e[1] for e in ev]).reshape(B * T, K)
                p = np.stack([e[2] for e in ev]).reshape(B * T, K)
                t = np.stack([e[3] for e in ev]).reshape(B * T, K)
                counts = (
                    np.stack([e[4] for e in ev])
                    .reshape(B * T, K)
                    .sum(axis=1)
                    .astype(np.int64)
                )
                grids = voxelize_trilinear_windows_host(
                    x, y, p, t, counts, bins, H, W,
                    crop_bottom=40,
                    norm_mode=1 if s.normalize_event_b else 0,
                    n_threads=s.num_cpu_workers,
                    layout="chw",
                )
                batch["event"] = grids.reshape(B, T, bins, H - 40, W)
            else:
                stacked = [
                    np.stack([e[i] for e in ev]).reshape(len(ev), T * K)
                    for i in range(5)
                ]
                vox = _device_voxelizer(
                    T, bins, H, W, s.normalize_event_b, crop_bottom=40,
                )
                batch["event"] = np.asarray(vox(*stacked))
        return batch
