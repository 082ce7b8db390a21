"""DCGAN generator (reference networks/conv_generator.py:3-33).

FC 128 -> 512*mg^2, three ConvTranspose(4,2,1)+BN+ReLU upsampling blocks,
ConvTranspose(3,1,1) head, Tanh. mg=4 -> 32px, mg=8 -> 64px. NHWC.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from iprgan_tpu.nn import BatchNorm, ConvTranspose, Dense


class ConvGenerator(nn.Module):
    mg: int
    z_dim: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        x = Dense(512 * self.mg * self.mg, dtype=self.dtype, name="fc")(z)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], self.mg, self.mg, 512)
        for i, ch in enumerate((256, 128, 64)):
            x = ConvTranspose(ch, 4, 2, padding=1, use_bias=False,
                              dtype=self.dtype, name=f"up{i}")(x)
            x = BatchNorm(dtype=self.dtype, name=f"norm{i}")(
                x, use_running_average=not train)
            x = nn.relu(x)
        x = ConvTranspose(3, 3, 1, padding=1, use_bias=False,
                          dtype=self.dtype, name="head")(x)
        return jnp.tanh(x).astype(jnp.float32)
