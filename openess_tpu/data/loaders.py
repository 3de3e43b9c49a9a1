"""Dataset factory (reference: base_trainer_ov.py:93-276 createXDataset).

Datasets expose ``__len__`` and ``get_batch(indices) -> dict`` of numpy
arrays in the batch convention of ``training/steps.py``.
"""
from __future__ import annotations

import os

from openess_tpu.config.settings import Settings


def build_datasets(s: Settings):
    name = s.dataset_name_b
    if name.startswith("synthetic"):
        from openess_tpu.data.synthetic import SyntheticESS

        h, w = int(s.img_size_b[0]), int(s.img_size_b[1])
        mk = lambda n, seed: SyntheticESS(
            num_samples=n, height=h, width=w,
            num_classes=s.semseg_num_classes,
            num_windows=s.nr_events_data_b,
            superpixel_size=s.superpixel_size,
            seed=seed,
        )
        train = _with_get_batch(mk(32, s.seed), s)
        val = _with_get_batch(mk(8, s.seed + 1), s)
        return train, val
    if name == "DSEC_events":
        from openess_tpu.data.dsec import DSECDataset

        train = DSECDataset(s, split="train")
        val = DSECDataset(s, split="val")
        return train, val
    if name == "DDD17_events":
        from openess_tpu.data.ddd17 import DDD17Dataset

        train = DDD17Dataset(s, split=s.split_train_b)
        val = DDD17Dataset(s, split="valid")
        return train, val
    raise ValueError(f"unknown dataset {name!r}")


def _with_get_batch(ds, s: Settings):
    from openess_tpu.training.build import VOXEL_OPTIONS

    if not hasattr(ds, "get_batch"):
        bins = s.nr_temporal_bins_b
        needs_events = s.config_option in VOXEL_OPTIONS
        if needs_events and s.wire_format == "raw_events":
            ds.get_batch = lambda idx: ds.raw_wire_batch(
                list(idx), num_bins=bins, t16=s.wire_t16
            )
        else:
            ds.get_batch = lambda idx: ds.voxelized_batch(list(idx), num_bins=bins)
    return ds
