"""Micro-benchmark that settled the Pallas trigger-kernel question.

North star: "trigger pipeline as on-device Pallas image kernels". This
script measures a hand-written Pallas kernel fusing the uint8->float
normalize with the corner trigger/watermark composite against the plain
jnp expression XLA fuses itself. Measured on the real v5e chip
(2026-08-16, 200 reps, scalar-fetch fenced):

    shape                  jnp        pallas
    (64, 32, 32, 3)     485 us        340 us
    (16, 24, 24, 3)     430 us        335 us
    (1, 128, 128, 3)    272 us        330 us
    (64, 128, 128, 3)   ~1 ms         VMEM OOM (scoped 20M > 16M limit)

Both are dispatch-dominated standalone (effective bandwidth < 3 GB/s vs
~800 GB/s HBM): the winner is whoever launches fewer ops, and neither
ever runs standalone in production. In the real train path the
normalize and the paste live INSIDE the jitted train chunk, where (a)
XLA fuses the elementwise chain into the surrounding graph for free,
and (b) the plain (un-pasted) f32 batch is also consumed by the
adversarial/cycle losses, so a fused u8->paste kernel cannot remove the
f32 materialization anyway. The kernel was therefore REMOVED from the
package (it previously lived at iprgan_tpu/ops/pallas_kernels.py); a
copy is inlined here so the measurement stays reproducible.

Run on the real chip:  python scripts/bench_pallas_trigger.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from iprgan_tpu.ops.paste import corner_slices, paste_corner

REPS = 200


def _kernel(x_ref, fg_ref, bg_ref, out_ref, *, scale, shift):
    # fg/bg pre-padded to full image size (bg == 1, fg == 0 outside the
    # corner): one elementwise VPU expression, no slicing primitives
    # (Mosaic lowers neither dynamic_update_slice nor u8->f32 casts; the
    # cast widens via int32).
    img = x_ref[0].astype(jnp.int32).astype(jnp.float32) * scale + shift
    bg = bg_ref[...]
    out_ref[0] = img * bg + (1.0 - bg) * fg_ref[...]


@functools.partial(jax.jit, static_argnames=("position", "normalized"))
def fused_normalize_paste(x_u8, fg, bg, position="tl", normalized=True):
    n, h, w, c = x_u8.shape
    s = fg.shape[0]
    y0, x0 = corner_slices(position, s, h, w)
    scale = (1.0 / 127.5) if normalized else (1.0 / 255.0)
    shift = -1.0 if normalized else 0.0
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


def normalize_paste_reference(x_u8, fg, bg, position="tl", normalized=True):
    x = x_u8.astype(jnp.float32)
    x = x / 127.5 - 1.0 if normalized else x / 255.0
    return paste_corner(x, fg, bg, position)


def bench(fn, *args):
    out = fn(*args)
    _ = float(out.sum())  # warm up + fence (block_until_ready is a no-op
    t0 = time.perf_counter()  # on the axon tunnel)
    for _ in range(REPS):
        out = fn(*args)
    _ = float(out.sum())
    return (time.perf_counter() - t0) / REPS


def main():
    print(f"backend: {jax.default_backend()}")
    ref = jax.jit(normalize_paste_reference, static_argnames=("position",))
    shapes = [
        ("dcgan-batch", (64, 32, 32, 3), 8),
        ("srgan-lr", (16, 24, 24, 3), 6),
        ("cyclegan", (1, 128, 128, 3), 32),
        ("large", (64, 128, 128, 3), 32),
    ]
    for name, shape, s in shapes:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(0, 256, shape, dtype=np.uint8))
        fg = jnp.asarray(rng.uniform(-1, 1, (s, s, 3)).astype(np.float32))
        bg = jnp.zeros((s, s, 1), jnp.float32)

        t_ref = bench(ref, x, fg, bg, "tl")
        try:
            a = np.asarray(ref(x, fg, bg, "tl"))
            b = np.asarray(fused_normalize_paste(x, fg, bg, "tl"))
            np.testing.assert_allclose(a, b, atol=1e-5)
            t_pl = bench(fused_normalize_paste, x, fg, bg, "tl")
            pl_txt = f"{t_pl * 1e6:8.1f} us"
        except Exception as e:
            pl_txt = f"FAILED ({type(e).__name__})"
        print(f"{name:12s} {str(shape):20s} jnp {t_ref * 1e6:8.1f} us  "
              f"pallas {pl_txt}")


if __name__ == "__main__":
    main()
