"""Confusion/mIoU equivalence against a numpy bincount oracle."""
import numpy as np

from openess_tpu.metrics import MetricsSemseg
from openess_tpu.ops.confusion import (
    confusion_matrix,
    confusion_to_acc,
    confusion_to_iou,
)


def np_confusion(pred, gt, C, ignore):
    m = gt != ignore
    x = pred[m] + C * gt[m]
    return np.bincount(x.ravel(), minlength=C * C).reshape(C, C)


def test_confusion_matches_numpy(rng):
    C = 11
    pred = rng.integers(0, C, size=(4, 50, 60))
    gt = rng.integers(0, C, size=(4, 50, 60))
    gt[rng.random(gt.shape) < 0.1] = 255
    ours = np.asarray(confusion_matrix(pred, gt, num_classes=C, ignore_label=255))
    ref = np_confusion(pred, gt, C, 255)
    np.testing.assert_array_equal(ours, ref)


def test_iou_acc_formulas(rng):
    C = 6
    conf = rng.integers(0, 1000, size=(C, C)).astype(np.int64)
    miou, per_class = confusion_to_iou(conf)
    acc = confusion_to_acc(conf)
    diag = np.diag(conf).astype(float)
    iou_ref = 100 * diag / (conf.sum(1) + conf.sum(0) - diag)
    np.testing.assert_allclose(np.asarray(per_class), iou_ref, rtol=1e-9)
    np.testing.assert_allclose(float(miou), iou_ref.mean(), rtol=1e-9)
    np.testing.assert_allclose(float(acc), 100 * diag.sum() / conf.sum(), rtol=1e-9)


def test_metrics_accumulator(rng):
    C = 6
    m = MetricsSemseg(C, 255, [f"c{i}" for i in range(C)])
    total = np.zeros((C, C), np.int64)
    for _ in range(3):
        pred = rng.integers(0, C, size=(2, 20, 20))
        gt = rng.integers(0, C, size=(2, 20, 20))
        m.update_batch(pred, gt)
        total += np_confusion(pred, gt, C, 255)
    out = m.get_metrics_summary()
    np.testing.assert_array_equal(out["cm"], total)
    assert 0 <= out["miou"] <= 100 and 0 <= out["acc"] <= 100
