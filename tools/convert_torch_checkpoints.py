#!/usr/bin/env python
"""Convert released torch checkpoints into orbax ``pretrained_file`` trees.

The reference ships torch assets (``E2VID_lightweight.pth.tar``, released
OpenESS ``Epoch_N.pt``/``ckp.pt`` checkpoints, self-supervised R50 teacher
weights, CLIP text embeddings ``.pth``); this tool remaps them onto
openess-tpu's NHWC flax param trees (openess_tpu/models/torch_convert.py,
per-layer parity-tested in tests/test_torch_parity.py) and writes a single
orbax checkpoint usable as ``checkpoint.pretrained_file`` in any config
(shape-filtered partial load, training/checkpoint.py:99).

Examples:
  # stage-2 fine-tuning from a released stage-1 OpenESS checkpoint
  python tools/convert_torch_checkpoints.py \
      --openess_ckpt Epoch_29.pt --e2vid E2VID_lightweight.pth.tar \
      --out converted/openess_pretrain

  # frozen frame teacher from DINO ResNet-50
  python tools/convert_torch_checkpoints.py \
      --teacher_r50 dino_resnet50_pretrain.pth --teacher_name model_frame \
      --out converted/dino_teacher

  # CLIP text embeddings .pth -> .npy for text_embeddings_path
  python tools/convert_torch_checkpoints.py \
      --text_pth dsec_text_embeddings.pth --text_out dsec_text.npy
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--openess_ckpt",
                    help="released OpenESS Epoch_N.pt / ckp.pt")
    ap.add_argument("--e2vid", help="E2VID_lightweight.pth.tar")
    ap.add_argument("--teacher_r50",
                    help="self-supervised ResNet-50 torch weights "
                         "(dino/moco/swav state_dict)")
    ap.add_argument("--teacher_name", default="model_frame",
                    choices=["model_frame", "model_recon"],
                    help="which teacher slot the R50 fills (frame2voxel/"
                         "frame2recon -> model_frame; recon2voxel -> "
                         "model_recon)")
    ap.add_argument("--text_pth", help="CLIP text embeddings .pth")
    ap.add_argument("--text_out", help="output .npy for --text_pth")
    ap.add_argument("--out", help="output orbax checkpoint directory")
    args = ap.parse_args()

    import torch

    from openess_tpu.models.torch_convert import (
        convert_dilation_teacher,
        convert_e2vid,
        convert_openess_checkpoint,
        load_e2vid_checkpoint,
    )

    params, stats = {}, {}
    text = None

    if args.openess_ckpt:
        p, s, text = convert_openess_checkpoint(args.openess_ckpt)
        params.update(p)
        stats.update(s)
        print(f"openess ckpt: models {sorted(p)}")

    if args.e2vid:
        params["front_sensor_b"] = load_e2vid_checkpoint(args.e2vid)
        print("e2vid: front_sensor_b loaded")

    if args.teacher_r50:
        sd = torch.load(args.teacher_r50, map_location="cpu")
        sd = sd.get("state_dict", sd)
        sd = {k.removeprefix("module."): v for k, v in sd.items()}
        p, s = convert_dilation_teacher(sd)
        params[args.teacher_name] = p
        stats[args.teacher_name] = s
        print(f"teacher r50 -> {args.teacher_name}")

    if args.text_pth:
        emb = torch.load(args.text_pth, map_location="cpu").float().numpy()
        out = args.text_out or args.text_pth.rsplit(".", 1)[0] + ".npy"
        np.save(out, emb.astype(np.float32))
        print(f"text embeddings {emb.shape} -> {out}")

    if params:
        assert args.out, "--out required when converting model weights"
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            os.path.abspath(args.out),
            {"params": params, "batch_stats": stats},
            force=True,
        )
        ckptr.wait_until_finished()
        print(f"wrote orbax checkpoint: {args.out} "
              f"(use as checkpoint.pretrained_file)")


if __name__ == "__main__":
    main()
