#!/usr/bin/env python
"""Annotation-free / zero-shot ESS evaluation (BASELINE.md rows 'MaskCLIP').

Runs the frozen MaskCLIP dense teacher over the validation split's recon (or
frame) images and reports confusion-matrix mIoU/Acc against ground truth —
the reference's zero-shot baseline protocol (maskClipFeatureExtractor used
as an annotation-free segmenter; README.md:376).

Requires converted CLIP checkpoints and per-dataset text embeddings.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse

import numpy as np

from openess_tpu.config.settings import load_settings
from openess_tpu.data.loaders import build_datasets
from openess_tpu.metrics import MetricsSemseg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--settings_file", required=True)
    ap.add_argument("--source", choices=["recon", "frame"], default="recon")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    from openess_tpu.models.maskclip import MaskClipFeatureExtractor
    from openess_tpu.models.torch_convert import convert_maskclip

    s = load_settings(args.settings_file, generate_log=False)
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

    _, val_ds = build_datasets(s)
    metrics = MetricsSemseg(
        s.semseg_num_classes, s.semseg_ignore_label, s.semseg_class_names
    )
    bs = s.batch_size_b
    for i in range(0, len(val_ds) - bs + 1, bs):
        batch = val_ds.get_batch(list(range(i, i + bs)))
        pred = np.asarray(infer(jnp.asarray(batch[args.source])))
        metrics.update_batch(pred, batch["label"])
    out = metrics.get_metrics_summary()
    print({k: round(float(v), 2) for k, v in out.items() if k != "cm"})


if __name__ == "__main__":
    main()
