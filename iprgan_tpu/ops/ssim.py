"""SSIM / MS-SSIM on NHWC images, numerics matching `pytorch_msssim`
(the library the reference uses for its watermark-consistency loss and
Q_WM metric, reference tools/loss.py:82-85 and
experiments/image_generation.py:208-215).

Gaussian window 11x11 (sigma 1.5), separable depthwise VALID convolution,
K1=0.01, K2=0.03. Everything is jittable and fuses into the train step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

K1 = 0.01
K2 = 0.03


@functools.lru_cache(maxsize=None)
def _window_np(win_size: int, sigma: float):
    import numpy as np

    coords = np.arange(win_size, dtype=np.float64) - win_size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return np.asarray(g, dtype=np.float32)


def gaussian_window(win_size: int = 11, sigma: float = 1.5) -> jax.Array:
    return jnp.asarray(_window_np(win_size, sigma))


def _blur(x: jax.Array, win: jax.Array) -> jax.Array:
    """Separable depthwise gaussian filter, VALID padding, NHWC.

    precision=HIGHEST is load-bearing: XLA:TPU lowers f32 convs to
    reduced-precision (bf16-pass) matmuls by default, and these blurs
    feed the variance cancellation E[x^2] - mu^2. On flat windows
    (e.g. the white field of a watermark target) true sigma^2 ~ 0 while
    the bf16 error is ~1e-3 — the same order as C2 = (0.03)^2 — which
    can flip the cs denominator negative and blow SSIM far outside
    [-1, 1] (measured -28 on a real eval crop before the fix; CPU
    tests never see it because XLA:CPU convs are exact f32)."""
    c = x.shape[-1]
    n = win.shape[0]
    kh = jnp.tile(win.reshape(n, 1, 1, 1), (1, 1, 1, c))  # HWIO, I=1 (depthwise)
    kw = jnp.tile(win.reshape(1, n, 1, 1), (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    return x


def _ssim_per_channel(x, y, data_range, win_size, sigma):
    win = gaussian_window(win_size, sigma)
    c1 = (K1 * data_range) ** 2
    c2 = (K2 * data_range) ** 2

    # one fused depthwise blur over the 5 statistics maps (x, y, xx, yy,
    # xy stacked on channels) instead of 5 separate filter calls
    stacked = jnp.concatenate([x, y, x * x, y * y, x * y], axis=-1)
    blurred = _blur(stacked, win)
    c = x.shape[-1]
    mu1 = blurred[..., 0 * c:1 * c]
    mu2 = blurred[..., 1 * c:2 * c]
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    # exact-arithmetic sigma^2 >= 0; clamp the fp dust so the cs
    # denominator can never dip below C2 (belt to _blur's
    # precision=HIGHEST braces — keeps SSIM inside [-1, 1])
    sigma1_sq = jnp.maximum(blurred[..., 2 * c:3 * c] - mu1_sq, 0.0)
    sigma2_sq = jnp.maximum(blurred[..., 3 * c:4 * c] - mu2_sq, 0.0)
    sigma12 = blurred[..., 4 * c:5 * c] - mu1_mu2

    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map

    ssim_pc = jnp.mean(ssim_map, axis=(1, 2))  # (N, C)
    cs_pc = jnp.mean(cs_map, axis=(1, 2))
    return ssim_pc, cs_pc


def ssim(x, y, data_range: float = 1.0, size_average: bool = True,
         win_size: int = 11, sigma: float = 1.5):
    """SSIM over NHWC float images. Returns scalar (size_average) or (N,)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    ssim_pc, _ = _ssim_per_channel(x, y, data_range, win_size, sigma)
    per_image = jnp.mean(ssim_pc, axis=1)
    return jnp.mean(per_image) if size_average else per_image


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def ms_ssim(x, y, data_range: float = 1.0, size_average: bool = True,
            win_size: int = 11, sigma: float = 1.5,
            weights=_MSSSIM_WEIGHTS):
    """Multi-scale SSIM (pytorch_msssim formulation: relu-clamped cs
    products across 2x-downsampled scales)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    weights = jnp.asarray(weights)
    levels = weights.shape[0]

    mcs = []
    for i in range(levels):
        ssim_pc, cs_pc = _ssim_per_channel(x, y, data_range, win_size, sigma)
        if i < levels - 1:
            mcs.append(jax.nn.relu(cs_pc))
            pad_h = x.shape[1] % 2
            pad_w = x.shape[2] % 2
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                ((0, 0), (0, pad_h), (0, pad_w), (0, 0))) / 4.0
            y = jax.lax.reduce_window(
                y, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                ((0, 0), (0, pad_h), (0, pad_w), (0, 0))) / 4.0

    ssim_pc = jax.nn.relu(ssim_pc)
    mcs_and_ssim = jnp.stack(mcs + [ssim_pc], axis=0)  # (L, N, C)
    per_channel = jnp.prod(mcs_and_ssim ** weights.reshape(-1, 1, 1), axis=0)
    per_image = jnp.mean(per_channel, axis=1)
    return jnp.mean(per_image) if size_average else per_image
