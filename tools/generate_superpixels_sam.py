#!/usr/bin/env python
"""Offline SAM superpixel generation (reference:
data_preparation/superpixel_generation_{ddd17,dsec}_sam[_ddp].py).

Writes ``sp_sam_rgb`` / ``superpixels_sam`` uint8 id-map PNGs: masks sorted
by area descending, rasterized so later (smaller) masks overwrite earlier
ones (reference :36-45). The mask generator is pluggable:

- ``--backend sam``  uses segment-anything's SamAutomaticMaskGenerator
  (requires the package + a SAM checkpoint — not bundled in this image);
- ``--backend slic`` falls back to our from-scratch SLIC, emitting the same
  id-map contract (useful when SAM weights are unavailable).

Sharding (--shard/--num_shards) replaces the reference's per-GPU mp.spawn
fan-out — the job is embarrassingly parallel (no inter-process comm).
Per-image failures are caught and skipped (reference :25-48), and existing
outputs are skipped for resume-by-files.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import glob
import os

import numpy as np
from PIL import Image


def masks_to_id_map(masks, shape) -> np.ndarray:
    """Area-desc sorted binary masks -> uint8 id map (reference :36-45)."""
    out = np.zeros(shape, np.uint8)
    masks = sorted(masks, key=lambda m: m["area"], reverse=True)
    for i, m in enumerate(masks):
        out[m["segmentation"]] = min(i + 1, 255)
    return out


def make_generator(backend: str, sam_checkpoint: str, n_segments: int):
    if backend == "sam":
        from segment_anything import (  # noqa: gated import
            SamAutomaticMaskGenerator,
            sam_model_registry,
        )

        sam = sam_model_registry["vit_h"](checkpoint=sam_checkpoint)
        gen = SamAutomaticMaskGenerator(sam)

        def run(img_u8):
            return masks_to_id_map(gen.generate(img_u8), img_u8.shape[:2])

        return run

    from openess_tpu.utils.slic import slic

    def run(img_u8):
        return np.minimum(
            slic(img_u8.astype(np.float32) / 255.0, n_segments=n_segments), 255
        ).astype(np.uint8)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["dsec", "ddd17"], required=True)
    ap.add_argument("--root", required=True)
    ap.add_argument("--backend", choices=["sam", "slic"], default="sam")
    ap.add_argument("--sam_checkpoint", default="")
    ap.add_argument("--n_segments", type=int, default=100)
    ap.add_argument("--shard", type=int, default=0)
    ap.add_argument("--num_shards", type=int, default=1)
    args = ap.parse_args()

    gen = make_generator(args.backend, args.sam_checkpoint, args.n_segments)

    if args.dataset == "dsec":
        paths = sorted(glob.glob(
            os.path.join(args.root, "*", "*", "images_aligned", "left", "*.png")))
        out_of = lambda p: p.replace("/images_aligned/", "/sp_sam_rgb/")
    else:
        paths = sorted(glob.glob(
            os.path.join(args.root, "dir*", "images_aligned", "*.png")))
        out_of = lambda p: p.replace("/images_aligned/", "/superpixels_sam/")

    for i, p in enumerate(paths[args.shard :: args.num_shards]):
        op = out_of(p)
        if os.path.exists(op):  # resume-by-files (reference :27-28)
            continue
        try:
            img = np.asarray(Image.open(p).convert("RGB"))
            ids = gen(img)
            os.makedirs(os.path.dirname(op), exist_ok=True)
            Image.fromarray(ids).save(op)
        except Exception as e:  # per-image failure tolerance (reference :25-48)
            print(f"[{args.shard}] FAILED {p}: {e}")
        if i % 20 == 0:
            print(f"[{args.shard}] {i} {op}")


if __name__ == "__main__":
    main()
