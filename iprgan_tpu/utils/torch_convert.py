"""Shared torch -> flax weight-layout primitives.

Used by both converter scripts (scripts/convert_torch_weights.py for
published pretrained checkpoints, scripts/convert_reference_checkpoint.py
for reference training runs) so the subtle mappings live in one place.
Numerically pinned by tests/test_fcn8s.py, tests/test_torch_parity.py
and tests/test_reference_checkpoint.py.
"""

from __future__ import annotations

import numpy as np


def conv_w(w: np.ndarray) -> np.ndarray:
    """torch Conv2d (out, in, kh, kw) -> flax (kh, kw, in, out)."""
    return np.transpose(w, (2, 3, 1, 0))


def convt_w(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (in, out, kh, kw) -> flax ConvTranspose
    (kh, kw, in, out) with a spatial flip: torch computes the conv
    gradient while flax correlates the kernel over the dilated input."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def dense_out_chw(w: np.ndarray, b: np.ndarray, c: int, h: int, ww: int):
    """torch Linear whose output is viewed (c, h, w) channel-major but
    consumed by an NHWC (h, w, c) reshape: permute the OUT axis.
    Returns (kernel (in, out), bias (out,))."""
    out, inp = w.shape
    assert out == c * h * ww, (w.shape, c, h, ww)
    k = w.reshape(c, h, ww, inp).transpose(1, 2, 0, 3).reshape(out, inp).T
    return (np.ascontiguousarray(k),
            b.reshape(c, h, ww).transpose(1, 2, 0).reshape(out))


def dense_in_chw(w: np.ndarray, c: int, h: int, ww: int) -> np.ndarray:
    """torch Linear over a flatten of (c, h, w) channel-major features
    where NHWC code flattens (h, w, c): permute the IN axis.
    Returns kernel (in, out)."""
    out = w.shape[0]
    assert w.shape[1] == c * h * ww, (w.shape, c, h, ww)
    k = w.reshape(out, c, h, ww).transpose(0, 2, 3, 1).reshape(out, -1).T
    return np.ascontiguousarray(k)
