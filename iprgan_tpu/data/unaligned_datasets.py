"""Unaligned image-pair datasets for CycleGAN
(reference datasets/unaligned_datasets.py).

Train: A drawn round-robin, B uniformly random; resize shorter side to
``load``, random crop ``crop``, random horizontal flip. Test: testA/testB
in order, center crop, no flip, batch size 1.
"""

from __future__ import annotations

import glob
import os
from typing import List

import numpy as np

from iprgan_tpu.registry import DATASETS


def _resize_short(img, load_size: int):
    from PIL import Image

    w, h = img.size
    scale = load_size / min(w, h)
    return img.resize((max(load_size, round(w * scale)),
                       max(load_size, round(h * scale))), Image.BICUBIC)


class UnalignedDataset:
    def __init__(self, path_a: List[str] | None, path_b: List[str] | None,
                 load: int, crop: int, test: bool = False,
                 arrays_a: np.ndarray | None = None,
                 arrays_b: np.ndarray | None = None,
                 name: str = "unaligned"):
        self.path_a, self.path_b = path_a, path_b
        self.arrays_a, self.arrays_b = arrays_a, arrays_b
        self.load = load
        self.crop = crop
        self.test = test
        self.name = name

    @property
    def size_a(self):
        return (len(self.path_a) if self.path_a is not None
                else len(self.arrays_a))

    @property
    def size_b(self):
        return (len(self.path_b) if self.path_b is not None
                else len(self.arrays_b))

    def __len__(self):
        return max(self.size_a, self.size_b)

    def _load_img(self, side: str, index: int) -> np.ndarray:
        from PIL import Image

        if side == "a":
            if self.arrays_a is not None:
                img = Image.fromarray(self.arrays_a[index])
            else:
                img = Image.open(self.path_a[index]).convert("RGB")
        else:
            if self.arrays_b is not None:
                img = Image.fromarray(self.arrays_b[index])
            else:
                img = Image.open(self.path_b[index]).convert("RGB")
        return np.asarray(_resize_short(img, self.load), np.uint8)

    def _crop(self, img: np.ndarray, rng: np.random.Generator | None):
        h, w, _ = img.shape
        c = self.crop
        if rng is None:  # center crop (test)
            y, x = (h - c) // 2, (w - c) // 2
        else:
            y = int(rng.integers(0, h - c + 1))
            x = int(rng.integers(0, w - c + 1))
        out = img[y:y + c, x:x + c]
        if rng is not None and rng.random() < 0.5:  # random h-flip
            out = out[:, ::-1]
        return out

    def sample_batches(self, rng: np.random.Generator, n_steps: int,
                       g_iter: int, bsz: int):
        c = self.crop
        a = np.empty((n_steps, g_iter, bsz, c, c, 3), np.uint8)
        b = np.empty((n_steps, g_iter, bsz, c, c, 3), np.uint8)
        for i in range(n_steps):
            for g in range(g_iter):
                for j in range(bsz):
                    ia = int(rng.integers(0, self.size_a))
                    ib = int(rng.integers(0, self.size_b))
                    a[i, g, j] = self._crop(self._load_img("a", ia), rng)
                    b[i, g, j] = self._crop(self._load_img("b", ib), rng)
        return a, b

    def park_images(self):
        """Decode + ``load``-resize every image once per side, stacked
        for HBM parking (``dataset.park: true``): random crop + flip then
        run on device inside the compiled chunk (data/parked.py).
        Requires one common post-resize shape per side (square sources,
        or a pre-squared corpus)."""
        stacks = []
        for side, total in (("a", self.size_a), ("b", self.size_b)):
            decoded = [self._load_img(side, i) for i in range(total)]
            shapes = {im.shape for im in decoded}
            if len(shapes) != 1:
                raise ValueError(
                    f"dataset.park needs uniformly sized images; side "
                    f"{side.upper()} of {self.name} has {len(shapes)} "
                    "distinct shapes after load-resize — pre-square the "
                    "corpus or use the streaming path")
            stacks.append(np.stack(decoded))
        return tuple(stacks)

    def iter_eval(self):
        """(a, b) single-image uint8 batches, in order, center-cropped."""
        n = len(self)
        for i in range(n):
            a = self._crop(self._load_img("a", i % self.size_a), None)
            b = self._crop(self._load_img("b", i % self.size_b), None)
            yield a[None], b[None]


def _dirs(path: str, test: bool):
    sub = ("testA", "testB") if test else ("trainA", "trainB")
    return (os.path.abspath(os.path.join(path, sub[0])),
            os.path.abspath(os.path.join(path, sub[1])))


@DATASETS.register("cityscapes")
def cityscapes(path: str, load: int = 143, crop: int = 128,
               test: bool = False, **_):
    dir_a, dir_b = _dirs(path, test)
    fa = sorted(glob.glob(os.path.join(dir_a, "*")))
    fb = sorted(glob.glob(os.path.join(dir_b, "*")))
    if not fa or not fb:
        raise FileNotFoundError(
            f"no images under {dir_a} / {dir_b} (no network egress; "
            "provide the dataset or use 'unaligned_synthetic')")
    return UnalignedDataset(fa, fb, load, crop, test, name="cityscapes")


def _blobs(rng, n: int, load: int):
    """Smooth full-range color blobs: 16x16 random uint8 upscaled."""
    from PIL import Image

    base = rng.integers(0, 256, (n, 16, 16, 3), dtype=np.uint8)
    return np.stack([
        np.asarray(Image.fromarray(im).resize((load + 8, load + 8),
                                              Image.BILINEAR))
        for im in base])


@DATASETS.register("unaligned_synthetic")
def unaligned_synthetic(path: str = "", load: int = 70, crop: int = 64,
                        test: bool = False, n: int = 12, **_):
    rng = np.random.default_rng(11)
    return UnalignedDataset(None, None, load, crop, test,
                            arrays_a=_blobs(rng, n, load),
                            arrays_b=_blobs(rng, n, load),
                            name="unaligned_synthetic")


@DATASETS.register("unaligned_synthetic_color")
def unaligned_synthetic_color(path: str = "", load: int = 70,
                              crop: int = 64, test: bool = False,
                              n: int = 12, **_):
    """A *learnable* unaligned translation task: domain A = full-color
    blobs, domain B = desaturated (grayscale) blobs from an independent
    draw. B->A (the protected generator GB) is colorization; A->B is
    desaturation. Unlike ``unaligned_synthetic`` — where both domains
    share one distribution, so the translation objective is degenerate
    and the budget-scale GAN saturates (see
    artifacts/full_budget_cyclegan/SUMMARY.md) — this task gives the
    discriminators a real decision boundary and keeps the generators
    unsaturated, which is what the black-box trigger branch needs to
    converge."""
    rng = np.random.default_rng(13)
    b = _blobs(rng, n, load)
    gray = b.mean(axis=-1, keepdims=True).astype(np.uint8)
    return UnalignedDataset(None, None, load, crop, test,
                            arrays_a=_blobs(rng, n, load),
                            arrays_b=np.repeat(gray, 3, axis=-1),
                            name="unaligned_synthetic_color")


@DATASETS.register("unaligned_synthetic_halfsat")
def unaligned_synthetic_halfsat(path: str = "", load: int = 70,
                                crop: int = 64, test: bool = False,
                                n: int = 12, **_):
    """An *invertible* unaligned translation task: domain A = full-color
    blobs, domain B = saturation-halved blobs from an independent draw
    (B = 0.5*A' + 0.5*gray(A')). Unlike ``unaligned_synthetic_color``
    (full desaturation), the map is information-preserving — the exact
    original is recoverable as A' = 2B - mean_c(B), a per-pixel linear
    op — so BOTH cycle losses and both identity losses are exactly
    satisfiable, the generators stay out of CycleGAN's steganographic
    regime, and the bbox trigger branch is not crowded out. Built after
    the full-desaturation demo measured the trigger being *unlearned*
    once cycle-A pressure forced high-frequency color steganography
    (artifacts/full_budget_cyclegan/SUMMARY.md, convergence demo
    section). The domains remain separable through InstanceNorm via
    inter-channel correlation (IN is per-channel affine and cannot
    erase it)."""
    rng = np.random.default_rng(17)
    b = _blobs(rng, n, load).astype(np.float32)
    gray = b.mean(axis=-1, keepdims=True)
    half = np.clip(0.5 * b + 0.5 * gray, 0, 255).round().astype(np.uint8)
    return UnalignedDataset(None, None, load, crop, test,
                            arrays_a=_blobs(rng, n, load),
                            arrays_b=half,
                            name="unaligned_synthetic_halfsat")
