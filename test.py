#!/usr/bin/env python
"""Evaluation entry point (reference: test.py): restores a checkpoint and runs
confusion-matrix mIoU/Acc over the validation split."""
import argparse
import logging

from openess_tpu.config.settings import load_settings
from openess_tpu.data.loaders import build_datasets
from openess_tpu.training.trainer import Trainer


def main():
    parser = argparse.ArgumentParser(description="Evaluate openess-tpu.")
    parser.add_argument("--settings_file", required=True)
    parser.add_argument("--checkpoint", default="", help="orbax checkpoint dir")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)
    settings = load_settings(args.settings_file, generate_log=False)
    if args.checkpoint:
        settings.resume_training = True
        settings.resume_ckpt_file = args.checkpoint

    _, val_ds = build_datasets(settings)
    trainer = Trainer(settings, val_ds, val_ds)
    summary = trainer.val_epochs()
    print({k: round(float(v), 2) for k, v in summary.items() if k != "cm"})


if __name__ == "__main__":
    main()
