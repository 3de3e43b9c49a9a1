"""DDD17-Seg dataset (reference: datasets/ddd17_events_loader.py,
datasets/extract_data_tools/example_loader_ddd17.py).

Memmap event files (``events.dat.t`` int64 [N,1], ``events.dat.xyp`` int16
[N,3]) with precomputed ``index/index_{10,50,250}ms.npy`` image->event-index
maps. Native 260x346; voxel grids are bilinearly resized (align_corners=True)
to 260x352 and the bottom 60 rows are cropped -> 200x352
(ddd17_events_loader.py:183-196); labels/pl/superpixels are nearest-resized
straight to 352x200 (:133-138).
"""
from __future__ import annotations

import functools
import glob
import os
from os.path import basename, dirname, join
from typing import Optional

import numpy as np
from PIL import Image

from openess_tpu.config.settings import Settings

HEIGHT, WIDTH = 260, 346
RESIZE_W = 352
CROP_BOTTOM = 60  # -> 200 rows


def get_split(dirs, split):
    return {
        "train": [dirs[0], dirs[2], dirs[3], dirs[4], dirs[5]],
        "valid": [dirs[1]],
    }[split]  # ddd17_events_loader.py:19-23


def load_dir(directory: str, t_interval: int):
    idx_name = {10: "index_10ms.npy", 250: "index_250ms.npy"}.get(
        t_interval, "index_50ms.npy"
    )
    img_ts_event_idx = np.load(join(directory, "index", idx_name))
    t_file = join(directory, "events.dat.t")
    n = int(os.path.getsize(t_file) / 8)
    t_events = np.memmap(t_file, dtype="int64", mode="r", shape=(n, 1))
    xyp = np.memmap(
        join(directory, "events.dat.xyp"), dtype="int16", mode="r", shape=(n, 3)
    )
    return img_ts_event_idx, t_events, xyp


def extract_events(t_events, xyp, img_idx, index_map, fixed_duration, nr_events):
    """[N, 4] int64 (x, y, t, p) (example_loader_ddd17.py:39-54)."""
    if fixed_duration:
        _, event_idx, before = index_map[img_idx]
        before = max(int(before), 0)
    else:
        _, event_idx, _ = index_map[img_idx]
        before = max(int(event_idx) - nr_events, 0)
    event_idx = int(event_idx)
    ev = np.concatenate(
        [
            np.array(t_events[before:event_idx], dtype="int64"),
            np.array(xyp[before:event_idx], dtype="int64"),
        ],
        -1,
    )
    return ev[:, [1, 2, 0, 3]]


@functools.lru_cache(maxsize=4)
def _device_voxelizer(num_windows, num_bins, separate_pol, normalize):
    """Device DDD17 voxelization. On TPU the scatter-free Pallas MXU kernel
    builds the per-polarity grids; elsewhere the bit-exact scatter op."""
    import jax
    import jax.numpy as jnp

    from openess_tpu.ops import normalize_nonzero, voxel_grid_bilinear_t
    from openess_tpu.ops.resize import resize_bilinear

    # the Pallas kernel uses TPU-specific memory spaces; other accelerators
    # fall back to the portable XLA scatter path
    use_mxu = jax.default_backend() == "tpu"

    @jax.jit
    def run(x, y, p, t, valid):  # [B, T, K]
        def one_window(args):
            if use_mxu:
                from openess_tpu.ops.voxelize_mxu import (
                    voxelize_windows_bilinear_t_mxu,
                )

                g = voxelize_windows_bilinear_t_mxu(
                    *args, num_windows=1, num_bins=num_bins,
                    height=HEIGHT, width=WIDTH, separate_pol=separate_pol,
                )  # [Cout, H, W]
                if normalize:
                    g = normalize_nonzero(g, unbiased=False)
            else:
                g = voxel_grid_bilinear_t(
                    *args, num_bins=num_bins, height=HEIGHT, width=WIDTH,
                    separate_pol=separate_pol, normalize=normalize,
                )  # [bins(, x2), H, W]
            g = jnp.moveaxis(g, 0, -1)  # [H, W, C]
            g = resize_bilinear(
                g, out_h=HEIGHT, out_w=RESIZE_W, align_corners=True
            )
            return g[: HEIGHT - CROP_BOTTOM]  # [200, 352, C]

        def one_sample(args):
            return jax.vmap(one_window)(args)  # [T, 200, 352, C]

        return jax.vmap(one_sample)((x, y, p, t, valid))

    return run


class DDD17Dataset:
    def __init__(self, s: Settings, split: str = "train"):
        self.s = s
        self.split = split
        dirs = sorted(glob.glob(join(s.dataset_path_b, "dir*")))
        assert dirs, s.dataset_path_b
        self.dirs = get_split(dirs, split)

        self.files = []
        for d in self.dirs:
            lf = sorted(glob.glob(join(d, "segmentation_masks", "*.png")))
            if s.skip_ratio != 1:
                lf = lf[: len(lf) // s.skip_ratio + 1]
            self.files += lf

        t_interval = (
            s.nr_events_data_b * s.delta_t_per_data_b if s.fixed_duration_b else -1
        )
        self.index_maps, self.event_data = {}, {}
        for d in self.dirs:
            idx_map, t_ev, xyp = load_dir(d, t_interval)
            self.index_maps[d] = idx_map
            self.event_data[d] = (t_ev, xyp)

    def __len__(self):
        return len(self.files)

    # ---------------- side channels ----------------

    @staticmethod
    def _resize_nearest(arr, w, h):
        return np.asarray(
            Image.fromarray(arr).resize((w, h), Image.NEAREST)
        )

    @staticmethod
    def _img(path):
        arr = np.asarray(Image.open(path), dtype=np.float32) / 255.0
        if arr.ndim == 2:
            arr = np.repeat(arr[..., None], 3, axis=-1)
        return arr[..., :3]

    @staticmethod
    def _aligned_path(file_path, source, img_prefix):
        """The reference's dir0/dir1 vs dir3.. naming quirk
        (ddd17_events_loader.py:201-231)."""
        path = file_path.replace("segmentation_masks", source)
        a = path.split("segmentation_")
        d = path.split("/")[-3]
        if d in ("dir0", "dir1"):
            path = a[0] + a[1]
            if img_prefix:
                path = path.replace(
                    path.split("/")[-1], img_prefix + path.split("/")[-1]
                )
        else:
            path = a[0] + "00" + a[1]
        return path

    def load_sample(self, idx) -> dict:
        s = self.s
        fp = self.files[idx]
        h_out = HEIGHT - CROP_BOTTOM
        mask = np.asarray(Image.open(fp))
        label = self._resize_nearest(mask, RESIZE_W, h_out).astype(np.int32)
        out = {"label": label, "file_path": fp}

        opt = s.config_option
        if opt in ("frame2voxel", "frame2recon"):
            out["frame"] = self._img(self._aligned_path(fp, "images_aligned", "img_"))
        if opt in ("recon2voxel", "frame2recon"):
            out["recon"] = self._img(fp.replace("segmentation_masks", "reconstructions"))

        if self.split == "train" and s.pl_sources:
            pp = self._aligned_path(fp, s.pl_sources, "segmentation_")
            pl = np.asarray(Image.open(pp))
            out["pl"] = self._resize_nearest(pl, RESIZE_W, h_out).astype(np.int32)
        else:
            out["pl"] = np.ones_like(label)

        if len(s.superpixel_sources) > 1:
            src = (
                "superpixels_sam"
                if s.superpixel_sources == "sp_sam_rgb"
                else s.superpixel_sources
            )
            sp = self._aligned_path(fp, src, "img_")
            if s.superpixel_sources == "sp_slic_rgb":
                sp = sp.replace(".png", "_slic_25.png")
            spix = np.asarray(Image.open(sp))
            out["superpixel"] = self._resize_nearest(
                spix, RESIZE_W, h_out
            ).astype(np.int32)
        else:
            out["superpixel"] = np.ones_like(label)
        out["sam_feat"] = np.ones((64, 64, 256), np.float32)
        return out

    def load_events(self, idx):
        """Padded per-window (x, y, p, t, valid), equal-count split
        (ddd17_events_loader.py:154-169)."""
        s = self.s
        fp = self.files[idx]
        d = dirname(dirname(fp))
        img_idx = int(basename(fp).split("_")[-1].split(".")[0]) - 1
        t_ev, xyp = self.event_data[d]
        nr_events = s.nr_events_data_b * s.nr_events_window_b
        events = extract_events(
            t_ev, xyp, img_idx, self.index_maps[d], s.fixed_duration_b, nr_events
        )
        T, K = s.nr_events_data_b, s.nr_events_window_b
        x = np.zeros((T, K), np.float32)
        y = np.zeros((T, K), np.float32)
        p = np.zeros((T, K), np.float32)
        t = np.zeros((T, K), np.float32)
        valid = np.zeros((T, K), bool)

        n_loaded = events.shape[0]
        if s.fixed_duration_b and n_loaded:
            t_ns = events[:, 2]
            dt = int((t_ns[-1] - t_ns[0]) / T)
            bounds = [0] + [
                int(np.searchsorted(t_ns, t_ns[0] + (i + 1) * dt)) for i in range(T)
            ]
        else:
            per = n_loaded // T
            bounds = [i * per for i in range(T + 1)]
        for i in range(T):
            seg = events[bounds[i] : min(bounds[i + 1], n_loaded)]
            n = min(seg.shape[0], K)
            if n == 0:
                continue
            seg = seg[-n:]
            x[i, :n] = seg[:, 0]
            y[i, :n] = seg[:, 1]
            t[i, :n] = seg[:, 2] - seg[0, 2]  # relative; kernel renormalizes
            t[i, n:] = t[i, n - 1]
            p[i, :n] = seg[:, 3]
            valid[i, :n] = True
        return x, y, p, t, valid

    def get_batch(self, indices) -> dict:
        s = self.s
        needs_events = s.config_option in ("recon2voxel", "frame2voxel")
        samples, ev = [], []
        for idx in indices:
            samples.append(self.load_sample(int(idx)))
            if needs_events:
                ev.append(self.load_events(int(idx)))
        batch = {}
        for key in ("frame", "recon", "label", "pl", "superpixel", "sam_feat"):
            if key in samples[0]:
                batch[key] = np.stack([sm[key] for sm in samples])
        if needs_events:
            if s.event_representation_b == "histogram":
                batch["event"] = self._host_voxelize(ev)
            elif s.wire_format == "raw_events":
                # production wire: compact sorted-chunk event streams
                # (trimmed to the bucketed batch-max chunk count); the
                # jitted step voxelizes + resizes on-device
                from openess_tpu.data.device_voxelize import wire_reuse_ok
                from openess_tpu.native import chunk_events_windows_host

                T = s.nr_events_data_b
                B = len(ev)
                K = ev[0][0].shape[1]
                wire = chunk_events_windows_host(
                    np.stack([e[0] for e in ev]).reshape(B * T, K),
                    np.stack([e[1] for e in ev]).reshape(B * T, K),
                    np.stack([e[2] for e in ev]).reshape(B * T, K),
                    np.stack([e[3] for e in ev]).astype(np.float64).reshape(B * T, K),
                    np.stack([e[4] for e in ev]).reshape(B * T, K),
                    height=HEIGHT, width=WIDTH, integer_coords=True,
                    n_threads=s.num_cpu_workers,
                    reuse_buffers=wire_reuse_ok(), t16=s.wire_t16,
                )
                from openess_tpu.data.device_voxelize import pack_wire_batch

                batch.update(pack_wire_batch(wire, B, T))
            elif s.host_voxelize:
                batch["event"] = self._host_voxelize(ev)
            else:
                stacked = [np.stack([e[i] for e in ev]) for i in range(5)]
                vox = _device_voxelizer(
                    s.nr_events_data_b, s.nr_temporal_bins_b,
                    s.separate_pol_b, s.normalize_event_b,
                )
                batch["event"] = np.moveaxis(np.asarray(vox(*stacked)), -1, 2)
        return batch

    def _host_voxelize(self, ev):
        """Native batched host representation (one call, parallel across the
        B*T windows) + torch-exact bilinear resize + crop. Dispatches on
        ``event_representation`` (data_util.py:17-35): voxel_grid (default)
        or the 2-channel count histogram."""
        from openess_tpu.native import (
            event_histogram_windows_host,
            voxelize_bilinear_t_windows_host,
        )
        from openess_tpu.ops.resize import resize_bilinear

        s = self.s
        T, bins = s.nr_events_data_b, s.nr_temporal_bins_b
        B = len(ev)
        K = ev[0][0].shape[1]
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
        if s.event_representation_b == "histogram":
            C = 2
            grids = event_histogram_windows_host(
                x, y, p, counts, HEIGHT, WIDTH,
                norm_mode=2 if s.normalize_event_b else 0,
                n_threads=s.num_cpu_workers,
            ).transpose(0, 2, 3, 1).reshape(B, T, HEIGHT, WIDTH, C)
        else:
            C = bins * (2 if s.separate_pol_b else 1)
            grids = voxelize_bilinear_t_windows_host(
                x, y, p, t, counts, bins, HEIGHT, WIDTH,
                separate_pol=s.separate_pol_b,
                norm_mode=2 if s.normalize_event_b else 0,
                n_threads=s.num_cpu_workers,
            ).reshape(B, T, HEIGHT, WIDTH, C)
        out = np.asarray(
            resize_bilinear(grids, out_h=HEIGHT, out_w=RESIZE_W, align_corners=True)
        )
        # planar [B, T, C, H, W] wire format (see dsec.py module docstring)
        return np.moveaxis(out[:, :, : HEIGHT - CROP_BOTTOM], -1, 2)
