#!/usr/bin/env python
"""Annotation-free / zero-shot ESS evaluation (BASELINE.md rows 'MaskCLIP'
and 'FC-CLIP').

Runs a frozen CLIP teacher over the validation split's recon (or frame)
images and reports confusion-matrix mIoU/Acc against ground truth — the
reference's zero-shot baseline protocol (README.md:376-377):

- ``--teacher maskclip``: the dense MaskCLIP extractor
  (maskClipFeatureExtractor as an annotation-free segmenter). Needs
  converted CLIP checkpoints + per-dataset text embeddings in the yaml.
- ``--teacher fcclip``: the in-repo FC-CLIP meta-arch over the dataset's
  class vocabulary (36-class extended vocab max-pooled to the 11 DSEC
  classes, mirroring the PL generation contract). Needs the released
  checkpoint (--fcclip_ckpt) and the CLIP BPE merges file (--bpe_vocab).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse

import numpy as np

from openess_tpu.config.settings import load_settings
from openess_tpu.data.loaders import build_datasets
from openess_tpu.metrics import MetricsSemseg


def build_maskclip_infer(s):
    import jax
    import jax.numpy as jnp
    import torch

    from openess_tpu.models.maskclip import MaskClipFeatureExtractor
    from openess_tpu.models.torch_convert import convert_maskclip

    assert s.maskclip_checkpoint and s.visual_projs_path and s.text_embeddings_path, (
        "annotation-free eval needs clip.maskclip_checkpoint, visual_projs_path "
        "and text_embeddings_path in the settings yaml"
    )
    backbone = torch.load(s.maskclip_checkpoint, map_location="cpu")
    projs = torch.load(s.visual_projs_path, map_location="cpu")
    text = torch.load(s.text_embeddings_path, map_location="cpu").float().numpy()
    params = convert_maskclip(backbone.get("state_dict", backbone), projs)
    model = MaskClipFeatureExtractor(
        num_classes=s.semseg_num_classes, dtype=jnp.bfloat16
    )

    @jax.jit
    def infer(img):
        logits = model.apply({"params": params}, img, jnp.asarray(text))
        return jnp.argmax(logits, axis=-1)

    return infer


def build_fcclip_infer(s, fcclip_ckpt, bpe_vocab):
    from openess_tpu.models.fcclip import build_fcclip_labeler

    dataset = "ddd17" if "DDD17" in s.dataset_name_b.upper() else "dsec"
    infer, num_classes = build_fcclip_labeler(fcclip_ckpt, bpe_vocab, dataset)
    if num_classes != s.semseg_num_classes:
        raise SystemExit(
            f"settings semseg_num_classes={s.semseg_num_classes} does not "
            f"match the {dataset} FC-CLIP remap ({num_classes} classes)"
        )
    return infer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--settings_file", required=True)
    ap.add_argument("--source", choices=["recon", "frame"], default="recon")
    ap.add_argument("--teacher", choices=["maskclip", "fcclip"],
                    default="maskclip")
    ap.add_argument("--fcclip_ckpt", help="released fcclip_cocopan.pth")
    ap.add_argument("--bpe_vocab", help="CLIP bpe_simple_vocab_16e6.txt.gz")
    args = ap.parse_args()

    import jax.numpy as jnp

    s = load_settings(args.settings_file, generate_log=False)
    if args.teacher == "fcclip":
        if not (args.fcclip_ckpt and args.bpe_vocab):
            raise SystemExit("--teacher fcclip needs --fcclip_ckpt/--bpe_vocab")
        infer = build_fcclip_infer(s, args.fcclip_ckpt, args.bpe_vocab)
    else:
        infer = build_maskclip_infer(s)

    _, val_ds = build_datasets(s)
    metrics = MetricsSemseg(
        s.semseg_num_classes, s.semseg_ignore_label, s.semseg_class_names
    )
    bs = s.batch_size_b
    n = len(val_ds)
    for i in range(0, n, bs):
        idx = list(range(i, min(i + bs, n)))
        pad = bs - len(idx)
        # pad the final batch to the static batch size (no recompile) and
        # mask the padded rows out of the confusion update — every val
        # sample is scored exactly once (reference drop_last=False)
        batch = val_ds.get_batch(idx + [idx[-1]] * pad)
        pred = np.asarray(infer(jnp.asarray(batch[args.source])))
        label = np.asarray(batch["label"])
        if pad:
            label = label.copy()
            label[len(idx):] = s.semseg_ignore_label
        metrics.update_batch(pred, label)
    out = metrics.get_metrics_summary()
    print({k: round(float(v), 2) for k, v in out.items() if k != "cm"})


if __name__ == "__main__":
    main()
