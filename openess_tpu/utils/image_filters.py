"""E2VID reconstruction post-processing (reference: e2vid/utils/inference_utils.py).

Reference-exact numpy forms, applied in the reference's order
(``image_reconstructor.py:135-136``: unsharp mask FIRST, then intensity
rescale):

- :func:`gaussian_kernel`    — the reference's quirky ``gkern`` (:38-46):
  sqrt of the outer product of normal-CDF increments, sum-normalized.
- :func:`unsharp_mask`       — ``(1+amount)*img - amount*conv2d(img, gkern)``
  with zero 'same' padding, NO clipping (UnsharpMaskFilter, :234-253).
- :class:`IntensityRescaler` — min/max tone map with auto-HDR clamps
  (Imin→[0,0.45], Imax→[0.55,1]) smoothed by a sliding median window, and
  the reference's uint8 quantize-dequantize (:90-130).
- :func:`intensity_rescale`  — stateless single-frame convenience wrapper.

Pure numpy/scipy; used by ``tools/generate_reconstructions.py`` so the
written PNGs match the reference's visual contract bit-for-bit.
"""
from __future__ import annotations

from collections import deque

import numpy as np
from scipy import ndimage, stats


def gaussian_kernel(kernlen: int = 5, nsig: float = 1.0) -> np.ndarray:
    """The reference's ``gkern`` (inference_utils.py:38-46) — NOT a standard
    gaussian: sqrt of the outer product of 1-D normal-CDF increments."""
    interval = (2 * nsig + 1.0) / kernlen
    x = np.linspace(-nsig - interval / 2.0, nsig + interval / 2.0, kernlen + 1)
    kern1d = np.diff(stats.norm.cdf(x))
    kernel_raw = np.sqrt(np.outer(kern1d, kern1d))
    return (kernel_raw / kernel_raw.sum()).astype(np.float32)


def unsharp_mask(img: np.ndarray, amount: float = 0.3, sigma: float = 1.0,
                 kernlen: int = 5) -> np.ndarray:
    """``(1 + amount)*img - amount*blur(img)`` (UnsharpMaskFilter.__call__).

    The blur is a 'same' convolution with :func:`gaussian_kernel` and ZERO
    boundary (torch ``F.conv2d(padding=k//2)``); the kernel is symmetric so
    convolution == cross-correlation. No clipping — the reference clamps
    later, inside the intensity rescaler."""
    img = np.asarray(img, np.float32)
    if amount <= 0:
        return img
    k = gaussian_kernel(kernlen, sigma)
    if img.ndim == 3:
        # (H, W, C): blur each channel independently
        blurred = np.stack(
            [ndimage.convolve(img[..., c], k, mode="constant", cval=0.0)
             for c in range(img.shape[-1])], axis=-1,
        )
    elif img.ndim == 2:
        blurred = ndimage.convolve(img, k, mode="constant", cval=0.0)
    else:
        raise ValueError(f"unsharp_mask expects (H, W) or (H, W, C), got {img.shape}")
    return (1.0 + amount) * img - amount * blurred


class IntensityRescaler:
    """Stateful tone mapper (IntensityRescaler, inference_utils.py:90-130).

    auto_hdr: per frame, Imin = clip(min, 0, 0.45), Imax = clip(max, 0.55, 1),
    each smoothed by the median of a sliding window of the last
    ``median_filter_size`` (+1) frames. The output is quantized to uint8 and
    dequantized back to [0, 1] float exactly as the reference does."""

    def __init__(self, imin: float = 0.0, imax: float = 1.0,
                 auto_hdr: bool = False, median_filter_size: int = 10):
        self.Imin = imin
        self.Imax = imax
        self.auto_hdr = auto_hdr
        self.median_filter_size = median_filter_size
        self.intensity_bounds: deque = deque()

    def __call__(self, img: np.ndarray) -> np.ndarray:
        img = np.asarray(img, np.float32)
        if self.auto_hdr:
            imin = float(np.clip(img.min(), 0.0, 0.45))
            imax = float(np.clip(img.max(), 0.55, 1.0))
            if len(self.intensity_bounds) > self.median_filter_size:
                self.intensity_bounds.popleft()
            self.intensity_bounds.append((imin, imax))
            self.Imin = float(np.median([b[0] for b in self.intensity_bounds]))
            self.Imax = float(np.median([b[1] for b in self.intensity_bounds]))
        # auto_hdr guarantees Imax - Imin >= 0.1; guard the manual path
        # against a degenerate user-supplied span
        out = 255.0 * (img - self.Imin) / max(self.Imax - self.Imin, 1e-9)
        out = np.clip(out, 0.0, 255.0)
        # torch .byte() truncates toward zero, then .float().div(255)
        return out.astype(np.uint8).astype(np.float32) / 255.0


def intensity_rescale(img: np.ndarray, imin: float = 0.0, imax: float = 1.0,
                      auto_hdr: bool = False) -> np.ndarray:
    """Stateless single-frame :class:`IntensityRescaler` (no median history)."""
    return IntensityRescaler(imin=imin, imax=imax, auto_hdr=auto_hdr)(img)
