"""Qualitative visualization utilities (reference: utils/viz_utils.py).

- :func:`colorize_semseg`  — label map -> RGB via the class color maps
  (viz_utils.py:118-146); ignore pixels render black.
- :func:`event_image`      — event tensor -> red/blue RGB (viz_utils.py:19-29).
- :func:`save_png`         — uint8 PNG writer.
"""
from __future__ import annotations

import numpy as np
from PIL import Image


def colorize_semseg(labels: np.ndarray, color_map: np.ndarray,
                    ignore_label: int = 255) -> np.ndarray:
    """[H, W] int labels -> [H, W, 3] uint8."""
    labels = np.asarray(labels)
    out = np.zeros((*labels.shape, 3), np.uint8)
    valid = labels != ignore_label
    safe = np.where(valid, labels, 0).astype(np.int64)
    safe = np.clip(safe, 0, len(color_map) - 1)
    out[valid] = color_map[safe[valid]]
    return out


def event_image(event_tensor: np.ndarray, separate_pol: bool = False) -> np.ndarray:
    """Voxel/histogram tensor [C, H, W] or [H, W, C] -> red(+)/blue(-) RGB."""
    ev = np.asarray(event_tensor, np.float32)
    if ev.ndim == 3 and ev.shape[-1] <= 16:  # NHWC
        ev = ev.transpose(2, 0, 1)
    if separate_pol:
        half = ev.shape[0] // 2
        pos = ev[:half].sum(0)
        neg = ev[half:].sum(0)
    else:
        summed = ev.sum(0)
        pos = np.maximum(summed, 0)
        neg = np.maximum(-summed, 0)
    h, w = pos.shape
    img = np.ones((h, w, 3), np.float32)
    scale = max(pos.max(), neg.max(), 1e-6)
    img[..., 1] -= (pos + neg) / scale
    img[..., 2] -= pos / scale
    img[..., 0] -= neg / scale
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def save_png(path, array: np.ndarray):
    Image.fromarray(array).save(path)
