"""SR quality metrics: BT.601 luma, PSNR, single-channel SSIM.

Mirrors the reference SR evaluation (image_super_resolution.py:158-163,
237-244): Y-channel via the ITU-R BT.601 matrix, 4-px border crop, PSNR
and SSIM on uint8 luma. The SSIM here reproduces
skimage.metrics.structural_similarity defaults (7x7 uniform window,
sample covariance, reflect-padded filters, pad-cropped mean) without the
skimage dependency.
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import uniform_filter


def rgb_to_luma_uint8(img_hwc: np.ndarray) -> np.ndarray:
    """float [0,1] HWC RGB -> uint8 Y channel (BT.601, like the
    reference's rgb2luma + tensor2numpy composition)."""
    u8 = np.uint8((np.clip(img_hwc, 0, 1) * 255).round())
    y = (np.float64(u8) @ [65.481, 128.553, 24.966]) / 255.0 + 16.0
    return np.uint8(y.round())


def psnr_uint8(a: np.ndarray, b: np.ndarray, data_range: float = 255.0):
    mse = np.mean((np.float64(a) - np.float64(b)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range ** 2 / mse))


def ssim_uint8(a: np.ndarray, b: np.ndarray, win_size: int = 7,
               data_range: float = 255.0) -> float:
    """skimage-default SSIM for 2-D uint8 arrays."""
    x = np.float64(a)
    y = np.float64(b)
    ndim = 2
    NP = win_size ** ndim
    cov_norm = NP / (NP - 1)  # sample covariance

    f = lambda im: uniform_filter(im, size=win_size)  # noqa: E731
    ux, uy = f(x), f(y)
    uxx, uyy, uxy = f(x * x), f(y * y), f(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    a1 = 2 * ux * uy + c1
    a2 = 2 * vxy + c2
    b1 = ux ** 2 + uy ** 2 + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)

    pad = (win_size - 1) // 2
    return float(s[pad:-pad, pad:-pad].mean())
