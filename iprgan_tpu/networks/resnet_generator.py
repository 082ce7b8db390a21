"""CycleGAN networks (reference networks/resnet_generator.py,
networks/conv_discriminator.py).

ResnetGenerator: ReflectionPad+7x7 conv, two stride-2 downs, N residual
blocks, two ConvTranspose ups, 7x7 conv + Tanh. InstanceNorm(affine)
throughout — those affine scales carry the white-box signature.

ConvDiscriminator: 70x70 PatchGAN, InstanceNorm without affine.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from iprgan_tpu.nn import Conv, ConvTranspose, InstanceNorm, reflect_pad


class _ResnetBlock(nn.Module):
    channel: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        h = reflect_pad(x, 1)
        h = Conv(self.channel, 3, 1, padding=0, dtype=self.dtype,
                 name="conv0")(h)
        h = InstanceNorm(affine=True, name="norm0")(h)
        h = nn.relu(h)
        h = reflect_pad(h, 1)
        h = Conv(self.channel, 3, 1, padding=0, dtype=self.dtype,
                 name="conv1")(h)
        h = InstanceNorm(affine=True, name="norm1")(h)
        return x + h


class ResnetGenerator(nn.Module):
    n_block: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = reflect_pad(x, 3)
        x = Conv(64, 7, 1, padding=0, dtype=self.dtype, name="head")(x)
        x = InstanceNorm(affine=True, name="head_norm")(x)
        x = nn.relu(x)

        for i in range(2):
            ch = 2 ** (i + 7)  # 128, 256
            x = Conv(ch, 3, 2, padding=1, dtype=self.dtype,
                     name=f"down{i}")(x)
            x = InstanceNorm(affine=True, name=f"down{i}_norm")(x)
            x = nn.relu(x)

        for i in range(self.n_block):
            x = _ResnetBlock(256, dtype=self.dtype, name=f"res{i:02d}")(x)

        for i in range(2):
            ch = 2 ** (7 - i)  # 128, 64
            x = ConvTranspose(ch, 3, 2, padding=1, output_padding=1,
                              dtype=self.dtype, name=f"up{i}")(x)
            x = InstanceNorm(affine=True, name=f"up{i}_norm")(x)
            x = nn.relu(x)

        x = reflect_pad(x, 3)
        x = Conv(3, 7, 1, padding=0, dtype=self.dtype, name="tail")(x)
        return jnp.tanh(x).astype(jnp.float32)


class ConvDiscriminator(nn.Module):
    """70x70 PatchGAN -> 1-channel logit map."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.2)  # noqa: E731
        x = Conv(64, 4, 2, padding=1, dtype=self.dtype, name="conv0")(x)
        x = lrelu(x)
        for i, (ch, s) in enumerate([(128, 2), (256, 2), (512, 1)]):
            x = Conv(ch, 4, s, padding=1, dtype=self.dtype,
                     name=f"conv{i + 1}")(x)
            x = InstanceNorm(affine=False, name=f"norm{i + 1}")(x)
            x = lrelu(x)
        x = Conv(1, 4, 1, padding=1, dtype=self.dtype, name="head")(x)
        return x.astype(jnp.float32)
