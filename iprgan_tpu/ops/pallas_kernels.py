"""Pallas TPU kernels for the trigger/watermark input pipeline.

The hot input path of a protected training step is: uint8 batch ->
float normalize -> corner-paste the trigger/watermark patch. XLA already
fuses the elementwise chain; this Pallas kernel additionally fuses the
uint8 load, normalization, and the corner composite into a single VMEM
pass per image (one HBM read + one write, no intermediate f32 batch in
HBM), per the north-star "trigger pipeline as on-device Pallas image
kernels".

Layout: NHWC. Each grid step processes one image block in VMEM; the
corner composite is a statically-sliced blend (offsets are compile-time
constants), so Mosaic lowers it without dynamic control flow.

Used on TPU backends; the jnp path (ops/paste.py) remains the reference
implementation and the fallback on CPU — the two are tested equivalent
(interpret mode) in tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from iprgan_tpu.ops.paste import corner_slices


def _kernel(x_ref, fg_ref, bg_ref, out_ref, *, scale, shift):
    """out = normalize(x) * bg + (1 - bg) * fg, with fg/bg pre-padded to
    full image size (bg == 1, fg == 0 outside the corner), so the whole
    composite is one elementwise VPU expression — no slicing primitives
    (Mosaic lowers neither dynamic_update_slice nor u8->f32 casts; the
    cast widens via int32)."""
    img = x_ref[0].astype(jnp.int32).astype(jnp.float32) * scale + shift
    bg = bg_ref[...]
    out_ref[0] = img * bg + (1.0 - bg) * fg_ref[...]


@functools.partial(jax.jit, static_argnames=("position", "normalized"))
def fused_normalize_paste(x_u8: jax.Array, fg: jax.Array, bg: jax.Array,
                          position: str = "tl",
                          normalized: bool = True) -> jax.Array:
    """uint8 (N,H,W,C) -> float32, normalized to [-1,1] (or [0,1]) with
    the (s,s,C) patch composited into the given corner, one pallas pass.
    """
    n, h, w, c = x_u8.shape
    s = fg.shape[0]
    y0, x0 = corner_slices(position, s, h, w)
    scale = (1.0 / 127.5) if normalized else (1.0 / 255.0)
    shift = -1.0 if normalized else 0.0

    # pad the patch to full image size: identity blend outside the corner
    pad = ((y0, h - s - y0), (x0, w - s - x0), (0, 0))
    fg_full = jnp.pad(fg, pad)
    bg_full = jnp.pad(bg, pad, constant_values=1.0)

    kernel = functools.partial(_kernel, scale=scale, shift=shift)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, w, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, w, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(x_u8, fg_full, bg_full)


def normalize_paste_reference(x_u8, fg, bg, position="tl",
                              normalized=True):
    """jnp reference for the fused kernel (and CPU fallback)."""
    from iprgan_tpu.ops.paste import paste_corner

    x = x_u8.astype(jnp.float32)
    x = x / 127.5 - 1.0 if normalized else x / 255.0
    return paste_corner(x, fg, bg, position)
