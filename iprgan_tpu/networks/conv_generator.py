"""DCGAN generator (reference networks/conv_generator.py:3-33).

FC 128 -> 512*mg^2, three ConvTranspose(4,2,1)+BN+ReLU upsampling blocks,
ConvTranspose(3,1,1) head, Tanh. mg=4 -> 32px, mg=8 -> 64px. NHWC.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from iprgan_tpu.nn import BatchNorm, ConvTranspose, Dense
from iprgan_tpu.nn.layers import torch_kernel_init


class _BlockedHeadInner(nn.Module):
    """Param-tree twin of the flax ``nn.ConvTranspose`` inside the
    ``ConvTranspose`` wrapper (same scope name 'convt', same 'kernel'
    param name/shape/init — so checkpoints are interchangeable and the
    init RNG stream produces bit-identical values). A stride-1 k3 p1
    ConvTranspose is exactly a SAME conv with the kernel used as-is
    (flax conv_transpose does not mirror the kernel), so the 64->3 head
    can be computed space-to-depth blocked for MXU lane occupancy."""

    features: int
    kernel_size: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[-1]
        fan_in = cin * k * k
        w = self.param("kernel", torch_kernel_init(fan_in),
                       (k, k, cin, self.features))
        x, w = nn.dtypes.promote_dtype(x, w, dtype=self.dtype)
        from iprgan_tpu.ops.blocked_conv import blocked_conv_s2d

        return blocked_conv_s2d(x, w, block=4)


class _BlockedHead(nn.Module):
    """Scope twin of the ``ConvTranspose`` wrapper: child module named
    'convt' so the param path is head/convt/kernel exactly like
    ConvTranspose's."""

    features: int
    kernel_size: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return _BlockedHeadInner(self.features, self.kernel_size,
                                 dtype=self.dtype, name="convt")(x)


class ConvGenerator(nn.Module):
    mg: int
    z_dim: int = 128
    dtype: Any = None
    # MXU lane-occupancy experiment for the 64->3 head (the only conv
    # in the net whose output channels < 8), mirroring SRResNet's
    # tail_s2d: compute it space-to-depth blocked (ops/blocked_conv.py).
    # Same linear map, same params/init — checkpoints don't care.
    # Default off pending an on-chip win (scripts/bench_breakdown.py).
    head_s2d: bool = False

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
        if self.head_s2d and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0:
            x = _BlockedHead(3, 3, dtype=self.dtype, name="head")(x)
        else:
            x = ConvTranspose(3, 3, 1, padding=1, use_bias=False,
                              dtype=self.dtype, name="head")(x)
        return jnp.tanh(x).astype(jnp.float32)
