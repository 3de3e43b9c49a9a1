"""E2VID reconstruction post-processing (reference: e2vid/utils/inference_utils.py).

- :func:`intensity_rescale`  — robust min/max tone mapping (IntensityRescaler,
  :90-130; fixed Imin/Imax variant).
- :func:`unsharp_mask`       — gaussian unsharp filter (UnsharpMaskFilter,
  :234-260: amount 0.3, sigma 1).

Pure numpy/scipy; used by ``tools/generate_reconstructions.py`` so the
written PNGs match the reference's visual contract.
"""
from __future__ import annotations

import numpy as np
from scipy import ndimage


def intensity_rescale(img: np.ndarray, imin: float = 0.0, imax: float = 1.0,
                      auto_hdr: bool = False) -> np.ndarray:
    """Rescale intensities into [0, 1]; ``auto_hdr`` uses the frame min/max."""
    img = np.asarray(img, np.float32)
    if auto_hdr:
        imin = float(img.min())
        imax = float(img.max())
    span = max(imax - imin, 1e-9)
    return np.clip((img - imin) / span, 0.0, 1.0)


def unsharp_mask(img: np.ndarray, amount: float = 0.3, sigma: float = 1.0) -> np.ndarray:
    """``img + amount * (img - gaussian(img))`` clipped to [0, 1]."""
    img = np.asarray(img, np.float32)
    blurred = ndimage.gaussian_filter(img, sigma=sigma)
    return np.clip(img + amount * (img - blurred), 0.0, 1.0)
