"""Spectrally-normalized DCGAN discriminator
(reference networks/sn_discriminator.py:4-38).

Three [SNConv 3x3 s1 + LeakyReLU(0.1) + SNConv 4x4 s2 + LeakyReLU] blocks,
SNConv 3x3 -> 512, flatten, SNLinear -> scalar logit. The power-iteration
``u``/``v`` vectors live in the ``spectral`` collection (carried state in
the jitted train step; one iteration per forward when ``update_sn``).
"""

from __future__ import annotations

from typing import Any

from flax import linen as nn

from iprgan_tpu.nn import SNConv, SNDense


class SNDiscriminator(nn.Module):
    md: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.1)  # noqa: E731
        for i, ch in enumerate((64, 128, 256)):
            x = SNConv(ch, 3, 1, padding=1, dtype=self.dtype,
                       name=f"block{i}_a")(x, update_sn)
            x = lrelu(x)
            x = SNConv(ch, 4, 2, padding=1, dtype=self.dtype,
                       name=f"block{i}_b")(x, update_sn)
            x = lrelu(x)
        x = SNConv(512, 3, 1, padding=1, dtype=self.dtype,
                   name="post")(x, update_sn)
        x = lrelu(x)
        x = x.reshape(x.shape[0], -1)
        x = SNDense(1, dtype=self.dtype, name="fc")(x, update_sn)
        return x.reshape(-1).astype("float32")
