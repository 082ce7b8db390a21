"""Device-side sampling from HBM-parked image stacks.

The reference feeds SR / translation training through DataLoader worker
processes (reference datasets/sr_datasets.py, unaligned_datasets.py);
the TPU-native fast path instead parks the whole (decoded, uniformly
sized) uint8 dataset in device HBM once and samples random crops / flips
INSIDE the compiled train chunk — zero host->device traffic during
training, which removes the host-bound idle measured on 1-core hosts
(`scripts/bench_sr_stream.py`). Enabled per-dataset with
``dataset.park: true``; requires every decoded image to share one shape
(true for the synthetic sets and for pre-resized corpora like the
Cityscapes ``load``-size crops; not for raw ImageNet).

The sampling math is a pure function of the PRNG key, so the stream is
identical for any mesh size (DP equivalence) and for multi-host launches
(every rank computes the same global batch; the gather runs sharded).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def crop_batch(images_u8, key, n_samples: int, size: int,
               flip: bool = False, with_meta: bool = False):
    """Sample ``n_samples`` random ``size``-crops from a parked stack.

    ``images_u8``: (N, H, W, C) uint8, replicated over the mesh.
    Returns (n_samples, size, size, C) uint8 crops; with ``flip`` each
    crop is horizontally mirrored with p=0.5 (the unaligned-dataset
    augmentation, reference datasets/unaligned_datasets.py). With
    ``with_meta`` also returns (idx, ys, xs, flips) for testing.
    """
    n, h, w, c = images_u8.shape
    kidx, ky, kx, kf = jax.random.split(key, 4)
    idx = jax.random.randint(kidx, (n_samples,), 0, n)
    ys = jax.random.randint(ky, (n_samples,), 0, h - size + 1)
    xs = jax.random.randint(kx, (n_samples,), 0, w - size + 1)
    imgs = jnp.take(images_u8, idx, axis=0)
    crops = jax.vmap(
        lambda im, y, x: jax.lax.dynamic_slice(
            im, (y, x, 0), (size, size, c)))(imgs, ys, xs)
    flips = jax.random.bernoulli(kf, 0.5, (n_samples,)) if flip else None
    if flip:
        crops = jnp.where(flips[:, None, None, None],
                          crops[:, :, ::-1, :], crops)
    if with_meta:
        return crops, (idx, ys, xs, flips)
    return crops
