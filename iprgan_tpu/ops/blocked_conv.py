"""Space-to-depth-blocked SAME convolution for tiny output channels.

The SRResNet tail is a 9x9 conv from 64 channels to **3** at full SR
resolution (reference networks/sr_resnet.py tail; ours
networks/sr_resnet.py:70-72). On the TPU MXU the output-channel axis
maps to the 128-wide lane dimension, so a 3-channel conv runs at 3/128
lane occupancy — its ~11% FLOP share costs several times that in step
time (measured in scripts/bench_srgan_breakdown.py component probes).

``blocked_conv_s2d`` computes the identical linear map on a
space-to-depth view: the HxWxC input becomes (H/B)x(W/B)x(B*B*C) and
the kxk kernel a (kc x kc) coarse kernel over B*B*C -> B*B*O channels.
For the tail (k=9, B=4): 3x3 x 1024 -> 48 — a proper MXU-shaped
contraction with 16x the lane occupancy. The result equals the plain
SAME conv exactly up to float summation order (same taps, same
weights; pinned by tests/test_blocked_conv.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def blocked_conv_s2d(x, w, b=None, block: int = 4):
    """SAME, stride-1, odd-k conv computed space-to-depth blocked.

    x: (N, H, W, C) with H % block == 0 and W % block == 0;
    w: (k, k, C, O) HWIO; b: (O,) or None. Returns (N, H, W, O).
    """
    n, h, wd, c = x.shape
    kh, kw, cin, cout = w.shape
    assert c == cin, (c, cin)
    assert kh == kw and kh % 2 == 1, "square odd kernel only"
    B = int(block)
    assert h % B == 0 and wd % B == 0, (h, wd, B)
    pad = (kh - 1) // 2

    # coarse tap index a covers dY = floor((p + dy - pad)/B) for output
    # phase p in [0,B) and fine tap dy in [0,k)
    t_min, t_max = -pad, (B - 1) + (kh - 1) - pad
    dy_lo, dy_hi = t_min // B, t_max // B  # python floor division
    kc = dy_hi - dy_lo + 1

    a = np.arange(kc)[:, None, None]
    r = np.arange(B)[None, :, None]  # fine residue inside the block
    p = np.arange(B)[None, None, :]  # output phase
    dy = (a + dy_lo) * B + r + pad - p  # (kc, B, B)
    dy = np.where((dy >= 0) & (dy < kh), dy, kh)  # kh -> zero pad row

    # Wb[a, b, (ry*B+rx)*C + c, (p*B+q)*O + o] = w[dy, dx, c, o]
    wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    wb = wp[dy[:, :, :, None, None, None], dy[None, None, None, :, :, :]]
    # axes now (a, ry, p, b, rx, q, c, o) -> (a, b, ry, rx, c, p, q, o)
    wb = wb.transpose(0, 3, 1, 4, 6, 2, 5, 7).reshape(
        kc, kc, B * B * cin, B * B * cout)

    xb = x.reshape(n, h // B, B, wd // B, B, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(n, h // B, wd // B, B * B * c)
    cpad = (-dy_lo, dy_hi)
    yb = jax.lax.conv_general_dilated(
        xb, wb, (1, 1), (cpad, cpad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    y = yb.reshape(n, h // B, wd // B, B, B, cout).transpose(
        0, 1, 3, 2, 4, 5).reshape(n, h, wd, cout)
    if b is not None:
        y = y + b
    return y
