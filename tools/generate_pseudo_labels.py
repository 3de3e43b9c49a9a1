#!/usr/bin/env python
"""Offline open-vocab pseudo-label generation (the T2E supervision source).

Reference: ``fc-clip/demo/generate_pl_dsec.py`` runs FC-CLIP panoptic
inference over a 36-class extended vocabulary and max-pools logits down to
the 11 DSEC classes (:104-127), writing argmax PNGs to ``pl_fcclip_rgb/``.

Two teachers satisfy the PNG/remap contract:

- ``--teacher fcclip`` (the reference's flagship): the JAX FC-CLIP
  meta-arch (``openess_tpu.models.fcclip``) with converted released weights
  (``--fcclip_ckpt fcclip_cocopan.pth``) and the VILD prompt ensemble built
  in-process from the checkpoint's own CLIP text tower (needs the CLIP BPE
  merges file, ``--bpe_vocab bpe_simple_vocab_16e6.txt.gz``).
- ``--teacher maskclip``: the dense MaskCLIP labeler (minimum-viable CLIP
  teacher; ~17 mIoU below FC-CLIP per the reference README:376-377).

The extended-vocabulary -> DSEC remap below mirrors the reference's
``user_to_dsec`` table group sizes: [1, 2, 1, 5, 3, 1, 1, 5, 13, 1, 3].
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import glob

import numpy as np
from PIL import Image

from openess_tpu.models.fcclip.labeler import (  # noqa: E402
    DATASET_REMAP,
    build_fcclip_labeler,
    maxpool_argmax,
)


def build_maskclip_infer(args):
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
    remap = DATASET_REMAP[args.dataset][0][:vocab]

    backbone = torch.load(args.clip_ckpt, map_location="cpu")
    projs = torch.load(args.visual_projs, map_location="cpu")
    params = convert_maskclip(backbone.get("state_dict", backbone), projs)
    model = MaskClipFeatureExtractor(num_classes=vocab, dtype=jnp.bfloat16)

    @jax.jit
    def infer(img):
        # img [1, H, W, 3] in [0, 1]
        logits = model.apply({"params": params}, img, jnp.asarray(text))
        return maxpool_argmax(logits, remap, args.num_classes)

    return infer


def build_fcclip_infer(args):
    infer, num_classes = build_fcclip_labeler(
        args.fcclip_ckpt, args.bpe_vocab, args.dataset
    )
    assert num_classes == args.num_classes, (
        f"--num_classes {args.num_classes} does not match the {args.dataset} "
        f"remap ({num_classes} classes)"
    )
    return infer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--dataset", choices=["dsec", "ddd17"], default="dsec")
    ap.add_argument("--teacher", choices=["fcclip", "maskclip"], default="fcclip")
    # fcclip teacher
    ap.add_argument("--fcclip_ckpt", help="released fcclip_cocopan.pth")
    ap.add_argument("--bpe_vocab", help="CLIP bpe_simple_vocab_16e6.txt.gz")
    # maskclip teacher
    ap.add_argument("--clip_ckpt")
    ap.add_argument("--visual_projs")
    ap.add_argument("--text_embeddings",
                    help="extended-vocabulary CLIP text embeddings .pth/.npy")
    ap.add_argument("--num_classes", type=int, default=None,
                    help="defaults to the dataset's class count (11/6)")
    ap.add_argument("--out_name", default="pl_fcclip_rgb")
    ap.add_argument("--shard", type=int, default=0)
    ap.add_argument("--num_shards", type=int, default=1)
    args = ap.parse_args()
    if args.num_classes is None:
        args.num_classes = {"dsec": 11, "ddd17": 6}[args.dataset]

    if args.teacher == "fcclip":
        if not (args.fcclip_ckpt and args.bpe_vocab):
            raise SystemExit("--teacher fcclip needs --fcclip_ckpt and --bpe_vocab")
        infer = build_fcclip_infer(args)
    else:
        if not (args.clip_ckpt and args.visual_projs and args.text_embeddings):
            raise SystemExit(
                "--teacher maskclip needs --clip_ckpt/--visual_projs/"
                "--text_embeddings"
            )
        infer = build_maskclip_infer(args)

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
