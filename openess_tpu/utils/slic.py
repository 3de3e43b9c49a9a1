"""SLIC superpixels, implemented from scratch (numpy + scipy.ndimage).

Fills the role of skimage.segmentation.slic in the reference's offline
superpixel generators (data_preparation/superpixel_segmenter_dsec_slic.py:
20-24: n_segments=100/25, compactness=6, sigma=3) — skimage is not available
in this environment, so this is a standalone implementation of the SLIC
algorithm (Achanta et al., TPAMI 2012): k-means in (L, a, b, x, y) space with
a spatial search window of 2S and distance
``D^2 = d_lab^2 + (d_xy / S)^2 * compactness^2``, followed by connectivity
enforcement (small components merged into their largest neighbor).
"""
from __future__ import annotations

import numpy as np
from scipy import ndimage


def _rgb_to_lab(rgb: np.ndarray) -> np.ndarray:
    """sRGB [0,1] -> CIELAB (D65)."""
    rgb = np.clip(rgb, 0.0, 1.0)
    linear = np.where(
        rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92
    )
    m = np.array(
        [
            [0.412453, 0.357580, 0.180423],
            [0.212671, 0.715160, 0.072169],
            [0.019334, 0.119193, 0.950227],
        ]
    )
    xyz = linear @ m.T
    white = np.array([0.950456, 1.0, 1.088754])
    xyz = xyz / white
    f = np.where(xyz > 0.008856, np.cbrt(xyz), 7.787 * xyz + 16.0 / 116.0)
    L = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return np.stack([L, a, b], axis=-1)


def _gaussian_blur(img: np.ndarray, sigma: float) -> np.ndarray:
    if sigma <= 0:
        return img
    return ndimage.gaussian_filter(img, sigma=(sigma, sigma, 0))


def slic(
    image: np.ndarray,
    n_segments: int = 100,
    compactness: float = 6.0,
    sigma: float = 3.0,
    max_iter: int = 10,
    min_size_factor: float = 0.25,
) -> np.ndarray:
    """Segment an RGB [0,1] (or grayscale) image into ~n_segments superpixels.

    Returns an int32 label map in [0, n_actual).
    """
    if image.ndim == 2:
        image = np.repeat(image[..., None], 3, axis=-1)
    h, w = image.shape[:2]
    lab = _rgb_to_lab(_gaussian_blur(image.astype(np.float64), sigma))

    s = int(max(1, round(np.sqrt(h * w / n_segments))))
    # grid-initialized centers
    ys = np.arange(s // 2, h, s)
    xs = np.arange(s // 2, w, s)
    cy, cx = np.meshgrid(ys, xs, indexing="ij")
    cy = cy.ravel().astype(np.float64)
    cx = cx.ravel().astype(np.float64)
    k = cy.size
    cl = lab[cy.astype(int), cx.astype(int)]  # [k, 3]

    ratio2 = (compactness / s) ** 2
    labels = np.full((h, w), -1, np.int32)
    dists = np.full((h, w), np.inf)

    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(max_iter):
        dists[:] = np.inf
        labels[:] = -1
        for ci in range(k):
            y0 = max(int(cy[ci]) - 2 * s, 0)
            y1 = min(int(cy[ci]) + 2 * s + 1, h)
            x0 = max(int(cx[ci]) - 2 * s, 0)
            x1 = min(int(cx[ci]) + 2 * s + 1, w)
            patch = lab[y0:y1, x0:x1]
            dc2 = np.sum((patch - cl[ci]) ** 2, axis=-1)
            dy = yy[y0:y1, x0:x1] - cy[ci]
            dx = xx[y0:y1, x0:x1] - cx[ci]
            d2 = dc2 + (dy * dy + dx * dx) * ratio2
            win = dists[y0:y1, x0:x1]
            better = d2 < win
            win[better] = d2[better]
            labels[y0:y1, x0:x1][better] = ci
        # update centers
        for ci in range(k):
            mask = labels == ci
            if not mask.any():
                continue
            cy[ci] = yy[mask].mean()
            cx[ci] = xx[mask].mean()
            cl[ci] = lab[mask].mean(axis=0)

    return _enforce_connectivity(labels, min_size=int(min_size_factor * s * s))


def _enforce_connectivity(labels: np.ndarray, min_size: int) -> np.ndarray:
    """Split disconnected fragments, then merge components smaller than
    ``min_size`` into an adjacent component; relabel contiguously."""
    h, w = labels.shape
    out = np.full((h, w), -1, np.int32)
    next_id = 0
    for ci in np.unique(labels):
        comp, n = ndimage.label(labels == ci)
        for j in range(1, n + 1):
            out[comp == j] = next_id
            next_id += 1

    sizes = np.bincount(out.ravel(), minlength=next_id)
    # iterate small components, absorb into a touching neighbor
    for ci in np.where(sizes < min_size)[0]:
        mask = out == ci
        if not mask.any():
            continue
        dil = ndimage.binary_dilation(mask)
        neighbors = out[dil & ~mask]
        neighbors = neighbors[neighbors != ci]
        if neighbors.size:
            tgt = np.bincount(neighbors).argmax()
            out[mask] = tgt

    # contiguous relabel
    uniq, inv = np.unique(out, return_inverse=True)
    return inv.reshape(h, w).astype(np.int32)
