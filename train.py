#!/usr/bin/env python
"""Train entry point (reference: train.py).

    python train.py --settings_file configs/synthetic_sup_only.yaml

Dispatches to the workload encoded in the YAML's clip section
(if_supervised_only / if_pretraining / if_finetuning / if_linear_probing /
else UDA — train.py:36-50 in the reference).
"""
import argparse
import logging

import numpy as np

from openess_tpu.config.settings import load_settings
from openess_tpu.data.loaders import build_datasets
from openess_tpu.training.build import task_from_settings
from openess_tpu.training.trainer import Trainer


def main():
    parser = argparse.ArgumentParser(description="Train openess-tpu.")
    parser.add_argument("--settings_file", required=True, help="Path to settings yaml")
    parser.add_argument("--no_log_dir", action="store_true")
    parser.add_argument(
        "--profile", metavar="DIR", default="",
        help="capture a jax.profiler device trace of the run into DIR "
             "(TensorBoard-loadable; see docs/ROOFLINE.md for reading it)",
    )
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)
    settings = load_settings(args.settings_file, generate_log=not args.no_log_dir)
    np.random.seed(settings.seed)

    train_ds, val_ds = build_datasets(settings)
    trainer = Trainer(settings, train_ds, val_ds)

    import contextlib

    from openess_tpu.utils.profiling import trace

    ctx = trace(args.profile) if args.profile else contextlib.nullcontext()
    task = task_from_settings(settings)
    with ctx:
        if task == "pretrain":
            trainer.pretraining()
        else:
            best = trainer.training()
            if best:
                print({k: v for k, v in best.items() if k in ("miou", "acc")})


if __name__ == "__main__":
    main()
