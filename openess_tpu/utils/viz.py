"""Qualitative visualization utilities (reference: utils/viz_utils.py).

- :func:`colorize_semseg`  — label map -> RGB via the class color maps
  (viz_utils.py:118-146); ignore pixels render black.
- :func:`event_image`      — event tensor -> red/blue RGB (viz_utils.py:19-29).
- :func:`confusion_matrix_png` — matshow plot of the raw confusion matrix
  (viz_utils.py:76-103) or the row-normalized annotated variant
  (viz_utils.py:148-176).
- :func:`pca_rgb`          — latent feature map -> 3-component PCA RGB
  (base_trainer_ov.py:558-565 ``computePCA``).
- :func:`image_grid`       — tile a batch of RGB images into one canvas
  (viz_utils.py ``createRGBGrid`` / torchvision make_grid equivalent).
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


def confusion_matrix_png(cm: np.ndarray, path: str, *, normalize: bool = False,
                         class_names=None) -> None:
    """Plot an NxN confusion matrix to ``path``.

    normalize=False reproduces ``visualizeConfusionMatrix``
    (viz_utils.py:76-103): matshow + grey diagonal, Labels/Predicted axes.
    normalize=True reproduces ``plot_confusion_matrix`` (viz_utils.py:
    148-176): row-normalized Blues heatmap with class-name ticks.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cm = np.asarray(cm, np.float64)
    n = cm.shape[0]
    if normalize:
        cm = cm / np.maximum(cm.sum(axis=1, keepdims=True), 1e-12)
        fig, ax = plt.subplots(1, 1, figsize=(10, 10))
        ax.imshow(cm, interpolation="nearest", cmap=plt.cm.Blues)
        ticks = np.arange(n)
        names = list(class_names) if class_names is not None else ticks
        ax.set_xticks(ticks)
        ax.set_xticklabels(names, rotation=45, ha="right")
        ax.set_yticks(ticks)
        ax.set_yticklabels(names)
        thresh = cm.max() / 2.0
        for i in range(n):
            for j in range(n):
                ax.text(j, i, f"{cm[i, j]:.2f}", ha="center", va="center",
                        color="white" if cm[i, j] > thresh else "black",
                        fontsize=8)
        ax.set_ylabel("True label")
        ax.set_xlabel("Predicted label")
    else:
        fig, ax = plt.subplots(1, 1, figsize=(16, 16))
        ax.matshow(cm)
        ax.plot([-0.5, n - 0.5], [-0.5, n - 0.5], "-", color="grey")
        ax.set_xlabel("Labels")
        ax.set_ylabel("Predicted")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)


def pca_rgb(feats: np.ndarray) -> np.ndarray:
    """[B, H, W, C] features -> [B, H, W, 3] uint8 via a 3-component PCA
    over all pixels (base_trainer_ov.py:558-565, NHWC instead of NCHW).
    Components are min-max normalized jointly so relative structure stays."""
    f = np.asarray(feats, np.float32)
    b, h, w, c = f.shape
    flat = f.reshape(-1, c)
    flat = flat - flat.mean(axis=0, keepdims=True)
    # top-3 right singular vectors via the [C, C] covariance eigensystem
    # (a full SVD of the [B*H*W, C] pixel matrix would build an unused
    # equally-huge U factor)
    _, vecs = np.linalg.eigh(flat.T @ flat)
    proj = flat @ vecs[:, ::-1][:, :3]  # [B*H*W, 3]
    lo, hi = proj.min(), proj.max()
    proj = (proj - lo) / max(hi - lo, 1e-12)
    return (proj.reshape(b, h, w, 3) * 255).astype(np.uint8)


def image_grid(images: np.ndarray, nrow: int = 4, pad: int = 2) -> np.ndarray:
    """[N, H, W, 3] uint8 -> one [gh, gw, 3] uint8 canvas, ``nrow`` images
    per row (createRGBGrid / torchvision.utils.make_grid semantics)."""
    imgs = np.asarray(images)
    n, h, w, _ = imgs.shape
    rows = (n + nrow - 1) // nrow
    canvas = np.zeros(
        (rows * (h + pad) - pad, nrow * (w + pad) - pad, 3), np.uint8
    )
    for i in range(n):
        r, c = divmod(i, nrow)
        canvas[r * (h + pad) : r * (h + pad) + h,
               c * (w + pad) : c * (w + pad) + w] = imgs[i]
    return canvas


def save_png(path, array: np.ndarray):
    Image.fromarray(array).save(path)
