#!/usr/bin/env python
"""Offline SLIC superpixel generation (reference:
data_preparation/superpixel_segmenter_{dsec,ddd17}_slic.py).

Walks the dataset tree, runs our from-scratch SLIC on each RGB frame and
writes ``sp_slic_rgb`` id-map PNGs with the reference's naming contract
(``*_slic_100.png`` DSEC / ``*_slic_25.png`` DDD17). Shardable across
processes with --shard/--num_shards (the reference's multi-GPU fan-out,
superpixel_generation_ddd17_sam_ddp.py:96-124, is embarrassingly parallel —
no inter-process communication needed).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import glob
import os

import numpy as np
from PIL import Image

from openess_tpu.utils.slic import slic


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["dsec", "ddd17"], required=True)
    ap.add_argument("--root", required=True)
    ap.add_argument("--n_segments", type=int, default=None)
    ap.add_argument("--compactness", type=float, default=6.0)
    ap.add_argument("--sigma", type=float, default=3.0)
    ap.add_argument("--shard", type=int, default=0)
    ap.add_argument("--num_shards", type=int, default=1)
    ap.add_argument("--skip_exist", action="store_true", default=True)
    args = ap.parse_args()

    if args.dataset == "dsec":
        n_seg = args.n_segments or 100
        paths = sorted(
            glob.glob(os.path.join(args.root, "*", "*", "images_aligned", "left", "*.png"))
        )
        def out_path(p):
            out = p.replace("/images_aligned/", "/sp_slic_rgb/")
            return out.replace(".png", f"_slic_{n_seg}.png")
    else:
        n_seg = args.n_segments or 25
        paths = sorted(
            glob.glob(os.path.join(args.root, "dir*", "images_aligned", "*.png"))
        )
        def out_path(p):
            out = p.replace("/images_aligned/", "/sp_slic_rgb/")
            return out.replace(".png", f"_slic_{n_seg}.png")

    paths = paths[args.shard :: args.num_shards]
    for i, p in enumerate(paths):
        op = out_path(p)
        if args.skip_exist and os.path.exists(op):
            continue
        img = np.asarray(Image.open(p), np.float32) / 255.0
        seg = slic(
            img, n_segments=n_seg, compactness=args.compactness, sigma=args.sigma
        )
        os.makedirs(os.path.dirname(op), exist_ok=True)
        Image.fromarray(seg.astype(np.uint8 if seg.max() < 256 else np.uint16)).save(op)
        if i % 20 == 0:
            print(f"[{args.shard}] {i}/{len(paths)} {op}")


if __name__ == "__main__":
    main()
