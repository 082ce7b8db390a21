"""SRGAN networks (reference networks/sr_resnet.py, networks/discriminator_96.py).

SRResNet: conv9+PReLU head, 16 residual (conv3-BN-PReLU-conv3-BN) blocks
plus conv3-BN inside one global residual, two PixelShuffle(2) up blocks
(4x SR), conv9 tail. Kaiming fan-in init (a=0.25 before PReLU, a=1 else).

Discriminator96: SRGAN-paper VGG-style D — 8 conv+BN+LeakyReLU(0.2)
blocks, conv6x6 -> 1024, 1x1 conv -> scalar logit per image.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from iprgan_tpu.nn import (
    BatchNorm,
    Conv,
    PReLU,
    kaiming_normal_fan_in,
    pixel_shuffle,
)
from iprgan_tpu.nn.layers import torch_bias_init


class _BlockedTailInner(nn.Module):
    """Param-tree twin of the flax ``nn.Conv`` inside the ``Conv``
    wrapper (same scope name 'conv', same 'kernel'/'bias' names, same
    shapes and initializers — so checkpoints are interchangeable and
    the init RNG stream produces bit-identical values), computing the
    conv through ops/blocked_conv.blocked_conv_s2d."""

    features: int
    kernel_size: int
    kernel_init: Any
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[-1]
        fan_in = cin * k * k
        w = self.param("kernel", self.kernel_init,
                       (k, k, cin, self.features))
        b = self.param("bias", torch_bias_init(fan_in), (self.features,))
        x, w, b = nn.dtypes.promote_dtype(x, w, b, dtype=self.dtype)
        from iprgan_tpu.ops.blocked_conv import blocked_conv_s2d

        return blocked_conv_s2d(x, w, b, block=4)


class _BlockedTail(nn.Module):
    """Scope twin of the ``Conv`` wrapper: child module named 'conv' so
    the param path is <name>/conv/{kernel,bias} exactly like Conv's."""

    features: int
    kernel_size: int
    kernel_init: Any
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return _BlockedTailInner(self.features, self.kernel_size,
                                 self.kernel_init, dtype=self.dtype,
                                 name="conv")(x)


class _ResBlock(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = Conv(64, 3, 1, padding=1, kernel_init=kaiming_normal_fan_in(0.25),
                 dtype=self.dtype, name="conv0")(x)
        h = BatchNorm(dtype=self.dtype, name="norm0")(
            h, use_running_average=not train)
        h = PReLU(name="act0")(h)
        h = Conv(64, 3, 1, padding=1, kernel_init=kaiming_normal_fan_in(1.0),
                 dtype=self.dtype, name="conv1")(h)
        h = BatchNorm(dtype=self.dtype, name="norm1")(
            h, use_running_average=not train)
        return x + h


class SRResNet(nn.Module):
    n_block: int = 16
    dtype: Any = None
    # MXU lane-occupancy fix for the 64->3 conv9 tail (the only conv in
    # the net whose output channels < 8): compute it space-to-depth
    # blocked (ops/blocked_conv.py) whenever the SR frame divides by 4.
    # Numerically the same linear map (same taps/weights; fp summation
    # order differs as with any layout change); params are identical
    # either way, so checkpoints don't care.
    tail_s2d: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv(64, 9, 1, padding=4, kernel_init=kaiming_normal_fan_in(0.25),
                 dtype=self.dtype, name="head")(x)
        x = PReLU(name="head_act")(x)

        h = x
        for i in range(self.n_block):
            h = _ResBlock(dtype=self.dtype, name=f"res{i:02d}")(h, train)
        h = Conv(64, 3, 1, padding=1, kernel_init=kaiming_normal_fan_in(1.0),
                 dtype=self.dtype, name="body_conv")(h)
        h = BatchNorm(dtype=self.dtype, name="body_norm")(
            h, use_running_average=not train)
        x = x + h

        for i in range(2):
            x = Conv(256, 3, 1, padding=1,
                     kernel_init=kaiming_normal_fan_in(1.0),
                     dtype=self.dtype, name=f"up{i}")(x)
            x = pixel_shuffle(x, 2)
            x = PReLU(name=f"up{i}_act")(x)

        if self.tail_s2d and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0:
            x = _BlockedTail(3, 9, kaiming_normal_fan_in(1.0),
                             dtype=self.dtype, name="tail")(x)
        else:  # odd eval frame sizes (Set5/Set14) take the plain conv
            x = Conv(3, 9, 1, padding=4,
                     kernel_init=kaiming_normal_fan_in(1.0),
                     dtype=self.dtype, name="tail")(x)
        return x.astype(jnp.float32)


class Discriminator96(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.2)  # noqa: E731
        x = Conv(64, 3, 1, padding=1, dtype=self.dtype, name="head")(x)
        x = lrelu(x)
        specs = [(64, 2), (128, 1), (128, 2), (256, 1),
                 (256, 2), (512, 1), (512, 2)]
        for i, (ch, s) in enumerate(specs):
            x = Conv(ch, 3, s, padding=1,
                     kernel_init=kaiming_normal_fan_in(0.2),
                     dtype=self.dtype, name=f"block{i}_conv")(x)
            x = BatchNorm(dtype=self.dtype, name=f"block{i}_norm")(
                x, use_running_average=not train)
            x = lrelu(x)
        x = Conv(1024, 6, 1, padding=0, dtype=self.dtype, name="fc0")(x)
        x = lrelu(x)
        x = Conv(1, 1, 1, padding=0, dtype=self.dtype, name="fc1")(x)
        return jnp.squeeze(x).astype(jnp.float32)
