#!/usr/bin/env python
"""Offline E2VID reconstruction generation (reference:
e2vid/run_reconstruction.py + the reconstructions/ PNG contract read by
sequence_ov.py:332-338).

For every label timestamp of every DSEC sequence (or DDD17 image index),
slices the trailing event windows, voxelizes on the native host kernel, runs
the jit-compiled recurrent reconstructor, and writes the final grayscale
frame as an RGB PNG under ``reconstructions/``.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import os
from pathlib import Path

import numpy as np
from PIL import Image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="DSEC root (train/ + test/)")
    ap.add_argument("--e2vid_ckpt", required=True,
                    help="E2VID_lightweight.pth.tar")
    ap.add_argument("--nr_windows", type=int, default=20)
    ap.add_argument("--events_per_window", type=int, default=100000)
    ap.add_argument("--shard", type=int, default=0)
    ap.add_argument("--num_shards", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from openess_tpu.config.settings import Settings
    from openess_tpu.data.dsec import DSECSequence
    from openess_tpu.models.e2vid import E2VIDReconstructor
    from openess_tpu.models.torch_convert import load_e2vid_checkpoint

    s = Settings()
    s.nr_events_data_b = args.nr_windows
    s.nr_events_window_b = args.events_per_window
    s.config_option = "recon2voxel"
    s.pl_sources = ""
    s.superpixel_sources = ""
    s.__post_init__()

    unet_params = load_e2vid_checkpoint(args.e2vid_ckpt)
    recon = E2VIDReconstructor(dtype=jnp.bfloat16, planar_input=True)
    variables = {"params": {"step": {"unet": unet_params}}}

    @jax.jit
    def run(windows):
        # planar [1, T, bins, H, W] wire format; the reconstructor
        # transposes per scan step (planar_input=True)
        imgs, _ = recon.apply(variables, windows)
        return jnp.clip(imgs[:, -1, :, :, 0], 0, 1)

    from openess_tpu.native import voxelize_trilinear_host

    seq_dirs = sorted(
        p for split in ("train", "test") for p in (Path(args.root) / split).iterdir()
        if (p / "events").is_dir()
    )
    for seq_dir in seq_dirs[args.shard :: args.num_shards]:
        seq = DSECSequence(seq_dir, "train", s, skip_ratio=1)
        out_dir = seq_dir / "reconstructions" / "left"
        out_dir.mkdir(parents=True, exist_ok=True)
        H, W = DSECSequence.HEIGHT, DSECSequence.WIDTH
        for i in range(len(seq)):
            name = os.path.basename(seq.label_paths[i])
            op = out_dir / name
            if op.exists():
                continue
            x, y, p, t, valid = seq.load_events(i)
            grids = np.zeros((1, args.nr_windows, 5, H, W), np.float32)
            for wi in range(args.nr_windows):
                m = valid[wi]
                grids[0, wi] = voxelize_trilinear_host(
                    x[wi][m], y[wi][m], p[wi][m], t[wi][m], 5, H, W
                )
            img = np.asarray(run(grids))[0]
            # reference post-processing chain (image_reconstructor.py:
            # intensity rescale + unsharp mask)
            from openess_tpu.utils.image_filters import intensity_rescale, unsharp_mask

            img = unsharp_mask(intensity_rescale(img), amount=0.3, sigma=1.0)
            rgb = np.repeat((img * 255).astype(np.uint8)[..., None], 3, -1)
            Image.fromarray(rgb).save(op)
            if i % 20 == 0:
                print(f"[{args.shard}] {seq_dir.name} {i}/{len(seq)}")


if __name__ == "__main__":
    main()
