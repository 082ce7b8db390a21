"""Corner-paste primitive for trigger/watermark compositing.

The black-box protection composites a foreground patch into one corner of
a batch of images: y = x, except y[corner] = x[corner]*bg + (1-bg)*fg
(reference tools/paste_watermark.py:45-52, tools/random_noise_patch.py).

On TPU this is a tiny elementwise update on a static corner slice —
expressed with lax.dynamic_update_slice so XLA fuses it straight into
whatever consumes the batch (generator input pipeline / loss). All
offsets are static, shapes fixed: nothing blocks fusion.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def corner_slices(position: str, s: int, h: int, w: int) -> Tuple[int, int]:
    """Top-left (row, col) offset of an s x s corner patch in an h x w
    image for position in {tl, tr, bl, br}."""
    assert position in ("tl", "tr", "bl", "br"), "invalid position"
    y = 0 if position[0] == "t" else h - s
    x = 0 if position[1] == "l" else w - s
    return y, x


def paste_corner(x: jax.Array, fg: jax.Array, bg: jax.Array,
                 position: str) -> jax.Array:
    """Composite patch into a corner of a batch.

    x: (N, H, W, C); fg: (s, s, C) foreground; bg: (s, s, 1) background
    mask (1 = keep original pixel, 0 = replace with fg).
    """
    n, h, w, c = x.shape
    s = fg.shape[0]
    y0, x0 = corner_slices(position, s, h, w)
    region = jax.lax.dynamic_slice(x, (0, y0, x0, 0), (n, s, s, c))
    blended = region * bg[None] + (1.0 - bg[None]) * fg[None]
    return jax.lax.dynamic_update_slice(x, blended.astype(x.dtype),
                                        (0, y0, x0, 0))


def apply_corner_mask(x: jax.Array, bg: jax.Array, position: str) -> jax.Array:
    """Crop the corner and white-out non-patch pixels — the eval-time
    comparator (reference tools/paste_watermark.py:54-61):
    y = ones*bg + (1-bg)*x[corner]."""
    n, h, w, c = x.shape
    s = bg.shape[0]
    y0, x0 = corner_slices(position, s, h, w)
    region = jax.lax.dynamic_slice(x, (0, y0, x0, 0), (n, s, s, c))
    return jnp.ones_like(region) * bg[None] + (1.0 - bg[None]) * region
