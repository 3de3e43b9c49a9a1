#!/usr/bin/env python
"""Offline open-vocab pseudo-label generation (the T2E supervision source).

Reference: ``fc-clip/demo/generate_pl_dsec.py`` runs FC-CLIP panoptic
inference over a 36-class extended vocabulary and max-pools logits down to
the 11 DSEC classes (:104-127), writing argmax PNGs to ``pl_fcclip_rgb/``.

This driver reproduces that contract with the jit-compiled MaskCLIP dense
teacher (our minimum-viable CLIP labeler; FC-CLIP itself is an offline
teacher, so any dense open-vocab model satisfying the PNG contract slots in).
The extended-vocabulary -> DSEC remap below mirrors the reference's
``user_to_dsec`` table group sizes: [1, 2, 1, 5, 3, 1, 1, 5, 13, 1, 3].

Requires converted CLIP weights (--clip_ckpt, --visual_projs) and text
embeddings for the extended vocabulary (--text_embeddings, [V, 512]).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import glob
import os

import numpy as np
from PIL import Image

# extended-vocab index -> DSEC class id (generate_pl_dsec.py:104-116)
USER_TO_DSEC = np.array(
    [0,
     1, 1,
     2,
     3, 3, 3, 3, 3,
     4, 4, 4,
     5,
     6,
     7, 7, 7, 7, 7,
     8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8,
     9,
     10, 10, 10]
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--dataset", choices=["dsec", "ddd17"], default="dsec")
    ap.add_argument("--clip_ckpt", required=True)
    ap.add_argument("--visual_projs", required=True)
    ap.add_argument("--text_embeddings", required=True,
                    help="extended-vocabulary CLIP text embeddings .pth/.npy")
    ap.add_argument("--num_classes", type=int, default=11)
    ap.add_argument("--out_name", default="pl_fcclip_rgb")
    ap.add_argument("--shard", type=int, default=0)
    ap.add_argument("--num_shards", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    from openess_tpu.models.maskclip import MaskClipFeatureExtractor
    from openess_tpu.models.torch_convert import convert_maskclip

    if args.text_embeddings.endswith(".npy"):
        text = np.load(args.text_embeddings)
    else:
        text = torch.load(args.text_embeddings, map_location="cpu").float().numpy()
    vocab = text.shape[0]
    remap = USER_TO_DSEC[:vocab]

    backbone = torch.load(args.clip_ckpt, map_location="cpu")
    projs = torch.load(args.visual_projs, map_location="cpu")
    params = convert_maskclip(
        backbone.get("state_dict", backbone), projs
    )
    model = MaskClipFeatureExtractor(num_classes=vocab, dtype=jnp.bfloat16)

    @jax.jit
    def infer(img):
        logits = model.apply({"params": params}, img, jnp.asarray(text))
        # max-pool extended-vocab logits into dataset classes
        out = jnp.full(
            logits.shape[:-1] + (args.num_classes,), -jnp.inf, logits.dtype
        )
        for user_idx in range(vocab):
            c = int(remap[user_idx])
            out = out.at[..., c].set(
                jnp.maximum(out[..., c], logits[..., user_idx])
            )
        return jnp.argmax(out, axis=-1).astype(jnp.uint8)

    if args.dataset == "dsec":
        paths = sorted(glob.glob(
            os.path.join(args.root, "*", "*", "images_aligned", "left", "*.png")))
        def out_path(p):
            parts = p.split(os.sep)
            parts[-3] = args.out_name  # images_aligned -> pl dir
            return os.sep.join(parts)
    else:
        paths = sorted(glob.glob(
            os.path.join(args.root, "dir*", "images_aligned", "*.png")))
        def out_path(p):
            return p.replace("/images_aligned/", f"/{args.out_name}/")

    for i, p in enumerate(paths[args.shard :: args.num_shards]):
        op = out_path(p)
        if os.path.exists(op):
            continue
        img = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
        pl = np.asarray(infer(img[None]))[0]
        os.makedirs(os.path.dirname(op), exist_ok=True)
        Image.fromarray(pl).save(op)
        if i % 20 == 0:
            print(f"[{args.shard}] {i} {op}")


if __name__ == "__main__":
    main()
