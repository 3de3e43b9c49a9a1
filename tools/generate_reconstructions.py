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
    ap.add_argument("--root", help="DSEC root (train/ + test/)")
    ap.add_argument("--e2vid_ckpt", required=True,
                    help="E2VID_lightweight.pth.tar")
    ap.add_argument("--nr_windows", type=int, default=20)
    ap.add_argument("--events_per_window", type=int, default=100000)
    ap.add_argument("--shard", type=int, default=0)
    ap.add_argument("--num_shards", type=int, default=1)
    # generic event-file mode (reference run_reconstruction.py over
    # .txt/.zip streams, fixed-count or fixed-duration windows)
    ap.add_argument("--events_file", help=".txt/.zip event stream "
                    "(t x y pol rows; header line)")
    ap.add_argument("--output_dir", help="PNG output dir for --events_file")
    ap.add_argument("--height", type=int, default=180)
    ap.add_argument("--width", type=int, default=240)
    ap.add_argument("--fixed_duration", action="store_true")
    ap.add_argument("--window_duration", type=float, default=33.33,
                    help="ms per window (--fixed_duration)")
    ap.add_argument("--num_events_per_pixel", type=float, default=0.35,
                    help="fixed-count window size = H*W*this "
                         "(run_reconstruction.py convention)")
    # reference post-processing knobs (e2vid/options/inference_options.py:31-47)
    ap.add_argument("--unsharp_mask_amount", type=float, default=0.3)
    ap.add_argument("--unsharp_mask_sigma", type=float, default=1.0)
    ap.add_argument("--Imin", type=float, default=0.0)
    ap.add_argument("--Imax", type=float, default=1.0)
    ap.add_argument("--auto_hdr", action="store_true",
                    help="compute Imin/Imax per frame, median-smoothed")
    ap.add_argument("--auto_hdr_median_filter_size", type=int, default=10)
    args = ap.parse_args()

    if args.events_file:
        reconstruct_event_file(args)
        return
    if not args.root:
        ap.error("--root is required (or use --events_file)")

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
            # reference post-processing chain, in the reference's order
            # (image_reconstructor.py:135-136: unsharp mask, THEN rescale)
            from openess_tpu.utils.image_filters import intensity_rescale, unsharp_mask

            img = intensity_rescale(unsharp_mask(img, amount=0.3, sigma=1.0))
            rgb = np.repeat((img * 255).astype(np.uint8)[..., None], 3, -1)
            Image.fromarray(rgb).save(op)
            if i % 20 == 0:
                print(f"[{args.shard}] {seq_dir.name} {i}/{len(seq)}")


def reconstruct_event_file(args):
    """Stream mode (run_reconstruction.py): carry ConvLSTM state across the
    WHOLE file, one reconstruction PNG per window."""
    import jax
    import jax.numpy as jnp

    from openess_tpu.data.event_file_readers import (
        fixed_duration_event_windows,
        fixed_size_event_windows,
    )
    from openess_tpu.models.e2vid import (
        UNetRecurrent,
        normalize_event_window,
    )
    from openess_tpu.models.torch_convert import load_e2vid_checkpoint
    from openess_tpu.native import voxelize_trilinear_host
    from openess_tpu.utils.image_filters import IntensityRescaler, unsharp_mask

    H, W = args.height, args.width
    out_dir = Path(args.output_dir or "reconstructions_out")
    out_dir.mkdir(parents=True, exist_ok=True)

    unet = UNetRecurrent(dtype=jnp.bfloat16)
    variables = {"params": load_e2vid_checkpoint(args.e2vid_ckpt)}

    # CropParameters parity (inference_utils.py:284-311): reflection-pad to
    # the next multiple of 2^num_encoders (ceil on top/left), center-crop
    # the reconstruction back
    import math

    def crop_size(v, n=3):
        return int(math.ceil(v / 2**n) * 2**n)

    Hc, Wc = crop_size(H), crop_size(W)
    pt = math.ceil(0.5 * (Hc - H)); pb = Hc - H - pt
    plft = math.ceil(0.5 * (Wc - W)); prt = Wc - W - plft
    cy, cx = Hc // 2, Wc // 2
    iy0, iy1 = cy - H // 2, cy - H // 2 + H
    ix0, ix1 = cx - W // 2, cx - W // 2 + W

    @jax.jit
    def step(win, states):
        win = normalize_event_window(win)
        win = jnp.pad(win, ((0, 0), (pt, pb), (plft, prt), (0, 0)),
                      mode="reflect")
        img, states, _ = unet.apply(variables, win, states)
        return jnp.clip(img[:, iy0:iy1, ix0:ix1, 0], 0, 1), states

    if args.fixed_duration:
        windows = fixed_duration_event_windows(
            args.events_file, duration_ms=args.window_duration
        )
    else:
        n = int(args.num_events_per_pixel * H * W)
        windows = fixed_size_event_windows(args.events_file, num_events=n)

    # ONE stateful rescaler across the stream, so --auto_hdr's sliding
    # median over (Imin, Imax) matches image_reconstructor.py:135-136
    rescaler = IntensityRescaler(
        imin=args.Imin, imax=args.Imax, auto_hdr=args.auto_hdr,
        median_filter_size=args.auto_hdr_median_filter_size,
    )
    states = None
    for i, ev in enumerate(windows):
        if ev.shape[0] == 0:
            continue
        t, x, y, pol = ev[:, 0], ev[:, 1], ev[:, 2], ev[:, 3]
        grid = voxelize_trilinear_host(x, y, pol, t, 5, H, W)
        win = jnp.asarray(grid.transpose(1, 2, 0)[None], jnp.float32)
        img, states = step(win, states)
        img = np.asarray(img)[0]
        img = rescaler(unsharp_mask(
            img, amount=args.unsharp_mask_amount, sigma=args.unsharp_mask_sigma
        ))
        Image.fromarray((img * 255).astype(np.uint8)).save(
            out_dir / f"frame_{i:010d}.png"
        )
        if i % 50 == 0:
            print(f"{i} windows -> {out_dir}")


if __name__ == "__main__":
    main()
