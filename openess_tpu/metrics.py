"""Semantic-segmentation metric accumulator (reference: evaluation/metrics.py:39-65)."""
from __future__ import annotations

import numpy as np

from openess_tpu.ops.confusion import (
    confusion_matrix,
    confusion_to_acc,
    confusion_to_iou,
)


class MetricsSemseg:
    """Accumulates a confusion matrix over batches; summary yields mIoU/Acc."""

    def __init__(self, num_classes: int, ignore_label: int, class_names):
        self.num_classes = num_classes
        self.ignore_label = ignore_label
        self.class_names = list(class_names)
        self.reset()

    def reset(self):
        self._conf = np.zeros((self.num_classes, self.num_classes), np.int64)

    def update_batch(self, pred_lbl, gt_lbl):
        conf = confusion_matrix(
            pred_lbl, gt_lbl,
            num_classes=self.num_classes, ignore_label=self.ignore_label,
        )
        self._conf += np.asarray(conf, np.int64)

    def get_metrics_summary(self) -> dict:
        miou, per_class = confusion_to_iou(self._conf)
        acc = confusion_to_acc(self._conf)
        out = {n: float(v) for n, v in zip(self.class_names, np.asarray(per_class))}
        out["miou"] = float(miou)
        out["acc"] = float(acc)
        out["cm"] = self._conf.copy()
        return out
