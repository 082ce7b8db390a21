"""Black-box trigger transforms (reference tools/).

Each transform is a host-side object holding *static* configuration
(patch size, corner, watermark pixels) plus:

* ``init_buffers(rng) -> dict`` — checkpointable device buffers (saved
  under the ``fn_inp`` / ``fn_out`` checkpoint keys);
* ``__call__(buffers, x) -> y`` — pure and jittable, fused into the
  compiled train/eval step;
* ``reset(rng) -> dict`` — fresh buffers (the overwrite attack resets the
  attacker's trigger, reference attack.py:66-67);
* image transforms also expose ``apply_mask(buffers, x)`` — the eval
  comparator that crops the corner and whites out non-patch pixels.

Input transforms: TransformDist / RandomBitMask / TransformVar act on
latents (N, z); RandomNoisePatch acts on NHWC images. The output
transform PasteWatermark acts on NHWC images.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from iprgan_tpu.ops.paste import apply_corner_mask, paste_corner
from iprgan_tpu.registry import TRANSFORMS

Buffers = Dict[str, Any]


@TRANSFORMS.register("TransformDist")
class TransformDist:
    """Latent trigger z -> sqrt(2*pi) * Phi(z) (Gaussian CDF; maps
    N(0,1) to Uniform(0, sqrt(2*pi))). Stateless.
    Reference tools/transform_dist.py:5-13."""

    def __init__(self, config, normalized: bool = False):
        self.config = config

    def init_buffers(self, rng=None) -> Buffers:
        return {}

    def reset(self, rng=None) -> Buffers:
        return {}

    def __call__(self, buffers: Buffers, z: jax.Array) -> jax.Array:
        y = 0.5 * (1.0 + jax.lax.erf(z / math.sqrt(2.0)))
        return y * math.sqrt(2.0 * math.pi)


@TRANSFORMS.register("RandomBitMask")
class RandomBitMask:
    """Scatter a constant into n_bit random latent dims.
    Reference tools/random_bitmask.py:4-30."""

    def __init__(self, config, normalized: bool = False):
        self.config = config
        self.n = config.n_bit
        self.c = config.constant
        self.z_dim = config.z_dim

    def init_buffers(self, rng) -> Buffers:
        perm = jax.random.permutation(rng, self.z_dim)[: self.n]
        return {"_mask": perm.astype(jnp.int32)}

    reset = init_buffers

    def __call__(self, buffers: Buffers, z: jax.Array) -> jax.Array:
        mask = buffers["_mask"]
        onehot = jnp.zeros((self.z_dim,), bool).at[mask].set(True)
        return jnp.where(onehot[None, :], jnp.asarray(self.c, z.dtype), z)


@TRANSFORMS.register("TransformVar")
class TransformVar:
    """z -> z*(1-a) + a*w with random binary mask a (p=0.25) and
    w = exp|N(0,1)|. Reference tools/transform_var.py:5-16."""

    def __init__(self, config, normalized: bool = False):
        self.config = config
        self.z_dim = config.get("z_dim", 128) if hasattr(config, "get") else 128

    def init_buffers(self, rng) -> Buffers:
        kw, ka = jax.random.split(rng)
        w = jnp.exp(jnp.abs(jax.random.normal(kw, (1, self.z_dim))))
        a = (jax.random.uniform(ka, (1, self.z_dim)) < 0.25).astype(jnp.float32)
        return {"w": w, "a": a}

    reset = init_buffers

    def __call__(self, buffers: Buffers, z: jax.Array) -> jax.Array:
        w, a = buffers["w"], buffers["a"]
        return z * (1.0 - a) + a * w


class _CornerPaste:
    """Shared corner-compositing machinery (NHWC)."""

    def __init__(self, config, normalized: bool = False):
        self.config = config
        self.normalized = normalized
        self.position = config.get("position", "tl")
        assert self.position in ("tl", "tr", "bl", "br"), "invalid position"
        self.size = config.size

    def __call__(self, buffers: Buffers, x: jax.Array) -> jax.Array:
        return paste_corner(x, buffers["fg"], buffers["bg"], self.position)

    def apply_mask(self, buffers: Buffers, x: jax.Array) -> jax.Array:
        return apply_corner_mask(x, buffers["bg"], self.position)


@TRANSFORMS.register("RandomNoisePatch")
class RandomNoisePatch(_CornerPaste):
    """Fixed uniform-noise s x s patch pasted into a corner (the
    SRGAN/CycleGAN input trigger). Reference tools/random_noise_patch.py."""

    def init_buffers(self, rng) -> Buffers:
        fg = jax.random.uniform(rng, (self.size, self.size, 3))
        if self.normalized:
            fg = fg * 2.0 - 1.0
        bg = jnp.zeros((self.size, self.size, 1), jnp.float32)
        return {"fg": fg, "bg": bg}

    reset = init_buffers


@TRANSFORMS.register("PasteWatermark")
class PasteWatermark(_CornerPaste):
    """Watermark-image corner paste (the black-box output transform).
    Reference tools/paste_watermark.py:6-61.

    The watermark PNG is loaded host-side with PIL: RGBA resized
    (bilinear) to s x s, composited onto white for the foreground;
    ``opaque`` replaces the whole square (bg = 0), otherwise bg masks
    where alpha == 0.
    """

    def _load(self):
        from PIL import Image

        s = self.size
        tmp = Image.open(self.config.watermark).convert("RGBA")
        tmp = tmp.resize((s, s), Image.BILINEAR)

        img = Image.new("RGBA", (s, s), "white")
        img.paste(tmp, (0, 0), mask=tmp)
        fg = np.asarray(img.convert("RGB"), np.float32) / 255.0  # (s, s, 3)

        if self.config.opaque:
            bg = np.zeros((s, s, 1), np.float32)
        else:
            mask = Image.new("RGBA", (s, s), (0,) * 4)
            mask.paste(tmp, (0, 0), mask=tmp)
            alpha = np.asarray(mask, np.float32)[..., 3:] / 255.0
            bg = (alpha == 0).astype(np.float32)

        if self.normalized:
            fg = fg * 2.0 - 1.0
        return fg, bg

    def init_buffers(self, rng=None) -> Buffers:
        fg, bg = self._load()
        return {"fg": jnp.asarray(fg), "bg": jnp.asarray(bg)}

    reset = init_buffers


def make_transform(config, normalized: bool):
    """Instantiate a transform from its YAML ``type`` string
    (reference models/wrappers.py:17-25)."""
    return TRANSFORMS(config.type)(config, normalized=normalized)
