"""VAE encoder/decoder (reference networks/encoder.py, networks/decoder.py).

Encoder32: 3 strided convs (+BN) -> two FC heads (mean, logvar) with the
reparameterization sample inside the forward (needs an explicit rng).
Decoder32: FC 128->2048, 3 ConvTranspose(4,2,1)+BN+ReLU, Sigmoid then
affine to [-1, 1].
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from iprgan_tpu.nn import BatchNorm, Conv, ConvTranspose, Dense


class Encoder32(nn.Module):
    z_dim: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv(32, 3, 2, padding=1, dtype=self.dtype, name="conv0")(x)
        x = BatchNorm(dtype=self.dtype, name="norm0")(
            x, use_running_average=not train)
        x = nn.relu(x)
        x = Conv(64, 3, 2, padding=1, dtype=self.dtype, name="conv1")(x)
        x = BatchNorm(dtype=self.dtype, name="norm1")(
            x, use_running_average=not train)
        x = nn.relu(x)
        x = Conv(128, 3, 2, padding=1, dtype=self.dtype, name="conv2")(x)
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)

        mean = Dense(self.z_dim, name="q_mean")(x)
        logvar = Dense(self.z_dim, name="q_logvar")(x)

        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(self.make_rng("reparam"), std.shape, std.dtype)
        z = eps * std + mean
        return z, (mean, logvar)


class Decoder32(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        x = Dense(2048, dtype=self.dtype, name="fc")(z)
        x = x.reshape(x.shape[0], 4, 4, 128)
        for i, ch in enumerate((64, 32)):
            x = ConvTranspose(ch, 4, 2, padding=1, dtype=self.dtype,
                              name=f"up{i}")(x)
            x = BatchNorm(dtype=self.dtype, name=f"norm{i}")(
                x, use_running_average=not train)
            x = nn.relu(x)
        x = ConvTranspose(3, 4, 2, padding=1, dtype=self.dtype, name="head")(x)
        x = nn.sigmoid(x.astype(jnp.float32))
        return x * 2.0 - 1.0
