"""Device-side antialiased bicubic 4x downscale for the SR data path.

The reference computes LR = PIL bicubic 1/4 of each HR crop on the host
inside DataLoader workers (reference datasets/sr_datasets.py:7-42). On a
host-starved machine that leaves the chip idle, so the train path ships
only the uint8 HR crops and computes LR inside the compiled chunk
(experiments/image_super_resolution.py). Evaluation keeps the host PIL
path for metric parity.

The weights replicate PIL's resampling exactly in float: Catmull-Rom
cubic (a = -0.5) with the support widened by the scale factor
(antialiasing) and boundary taps clipped + renormalized. Only PIL's
per-pass uint8 fixed-point rounding is not reproduced (we keep float32
on device); difference vs PIL is within 1 uint8 level (tested).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _cubic(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    ax = np.abs(x)
    return np.where(
        ax < 1, ((a + 2) * ax - (a + 3)) * ax * ax + 1,
        np.where(ax < 2, (((ax - 5) * ax + 8) * ax - 4) * a, 0.0))


def pil_downscale_weights(n_in: int, scale: int = 4) -> np.ndarray:
    """(n_in/scale, n_in) row-stochastic matrix reproducing one PIL
    bicubic downscale pass (ImagingResampleHorizontal coefficients)."""
    assert n_in % scale == 0
    n_out = n_in // scale
    support = 2.0 * scale  # cubic support 2, widened by filterscale
    mat = np.zeros((n_out, n_in))
    for i in range(n_out):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), n_in)
        j = np.arange(xmin, xmax)
        w = _cubic((j - center + 0.5) / scale)
        mat[i, xmin:xmax] = w / w.sum()
    return mat


@functools.lru_cache(maxsize=8)
def _weights_np(n_in: int, scale: int) -> np.ndarray:
    # cache HOST numpy only: caching the jnp array would capture a
    # tracer when the first call happens inside a jit trace, and leak it
    # into later traces (surfaced by the SRGAN attack e2e, which traces
    # the chunk once per experiment in one process)
    return pil_downscale_weights(n_in, scale).astype(np.float32)


def bicubic_down4(hr, scale: int = 4):
    """(..., H, W, C) float -> (..., H/4, W/4, C), PIL-bicubic semantics.
    Separable two-matmul formulation so XLA maps it onto the MXU."""
    h, w = hr.shape[-3], hr.shape[-2]
    wh = jnp.asarray(_weights_np(h, scale))
    ww = jnp.asarray(_weights_np(w, scale))
    out = jnp.einsum("oh,...hwc->...owc", wh, hr)
    return jnp.einsum("pw,...owc->...opc", ww, out)
