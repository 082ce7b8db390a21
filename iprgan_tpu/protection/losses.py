"""Watermark-consistency loss factories (reference tools/loss.py:10-85).

``make_loss(name, normalized)`` returns ``fn(x, y) -> scalar``; when
``normalized`` the inputs are denormalized from [-1,1] to [0,1] before
the metric (the SSIM data_range is 1 either way, matching the reference).
All shipped configs use 'ssim' (1 - SSIM).
"""

from __future__ import annotations

import jax.numpy as jnp

from iprgan_tpu.ops.ssim import ms_ssim, ssim
from iprgan_tpu.registry import LOSSES


@LOSSES.register("l1")
def _l1():
    return lambda x, y: jnp.mean(jnp.abs(x - y))


@LOSSES.register("mse")
def _mse():
    return lambda x, y: jnp.mean((x - y) ** 2)


@LOSSES.register("ssim")
def _ssim():
    return lambda x, y: 1.0 - ssim(x, y, data_range=1.0)


@LOSSES.register("ms_ssim")
def _ms_ssim():
    return lambda x, y: 1.0 - ms_ssim(x, y, data_range=1.0)


def make_loss(name: str, normalized: bool = False):
    fn = LOSSES(name)()
    if not normalized:
        return fn

    def denormed(x, y):
        return fn((x + 1.0) / 2.0, (y + 1.0) / 2.0)

    return denormed
