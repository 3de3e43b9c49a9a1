"""Confusion-matrix mIoU/Acc — jitted bincount (reference: evaluation/metrics.py).

The reference computes ``bincount(pred + C*gt)`` on GPU and accumulates on CPU
(``evaluation/metrics.py:4-23``). Here the whole update is one jitted op; the
ignore-label mask redirects ignored pixels out of range (dropped by scatter),
so no boolean indexing / dynamic shapes are needed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("num_classes", "ignore_label"))
def confusion_matrix(
    pred: Array, label: Array, *, num_classes: int, ignore_label: int = 255
) -> Array:
    """``[num_classes, num_classes]`` int32 confusion; rows = GT, cols = pred."""
    c = num_classes
    valid = label != ignore_label
    flat = pred.astype(jnp.int32) + c * label.astype(jnp.int32)
    flat = jnp.where(valid, flat, c * c)
    out = jnp.zeros((c * c,), jnp.int32)
    out = out.at[flat.reshape(-1)].add(1, mode="drop")
    return out.reshape(c, c)


def confusion_to_iou(conf) -> tuple:
    """(mean IoU %, per-class IoU %) in float64 — reference metrics.py:26-31.

    Host-side numpy (jnp would silently downcast to f32 without x64 mode).
    """
    conf = np.asarray(conf, np.float64)
    diag = np.diagonal(conf)
    denom = np.clip(conf.sum(1) + conf.sum(0) - diag, 1e-12, None)
    iou = 100.0 * diag / denom
    return iou.mean(), iou


def confusion_to_acc(conf):
    """Overall pixel accuracy % — reference metrics.py:33-37."""
    conf = np.asarray(conf, np.float64)
    return 100.0 * np.diagonal(conf).sum() / np.clip(conf.sum(), 1e-12, None)
