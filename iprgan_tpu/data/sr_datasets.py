"""Super-resolution datasets (reference datasets/sr_datasets.py).

Train: random ``size`` crops of images under ``path`` with LR = bicubic
1/4 downscale; both returned in [0,1] (as uint8 here, normalized on
device). Test: center-crop to a multiple of 4, batch size 1, no shuffle.
``imagenet`` / ``set5`` / ``set14`` / ``bsd100`` all alias this loader;
``sr_synthetic`` serves tests/benchmarks without files on disk.
"""

from __future__ import annotations

import glob
import os
from typing import List

import numpy as np

from iprgan_tpu.registry import DATASETS


class SRDataset:
    """File-backed (or array-backed) 4x SR dataset."""

    def __init__(self, files: List[str] | None, size: int,
                 arrays: np.ndarray | None = None, name: str = "sr"):
        assert size % 4 == 0 or size < 0, f"{size} not divisible by 4"
        self.files = files
        self.arrays = arrays
        self.size = size
        self.name = name

    def __len__(self):
        return len(self.files) if self.files is not None else len(self.arrays)

    def _load(self, index: int) -> "np.ndarray":
        if self.arrays is not None:
            return self.arrays[index]
        from PIL import Image

        return np.asarray(
            Image.open(self.files[index]).convert("RGB"), np.uint8)

    def _random_crop(self, img: np.ndarray, rng: np.random.Generator):
        h, w, _ = img.shape
        s = self.size
        if h < s or w < s:  # edge case: pad small images (reference errors)
            img = np.pad(img, ((0, max(0, s - h)), (0, max(0, s - w)),
                               (0, 0)), mode="reflect")
            h, w, _ = img.shape
        y = int(rng.integers(0, h - s + 1))
        x = int(rng.integers(0, w - s + 1))
        return img[y:y + s, x:x + s]

    @staticmethod
    def _bicubic_down4(hr_u8: np.ndarray) -> np.ndarray:
        from PIL import Image

        h, w, _ = hr_u8.shape
        return np.asarray(Image.fromarray(hr_u8).resize(
            (w // 4, h // 4), Image.BICUBIC), np.uint8)

    def sample_batches(self, rng: np.random.Generator, n_steps: int,
                       g_iter: int, bsz: int, workers: int = 0,
                       hr_only: bool = False):
        """uint8 stacks: lr (n, g_iter, B, s/4, s/4, 3), hr (n, g_iter, B, s, s, 3).

        ``workers`` > 1 decodes/crops with a thread pool (PIL releases
        the GIL) — the counterpart of the reference's DataLoader worker
        processes (resource.worker). With ``hr_only`` the host skips the
        PIL bicubic 1/4 (returns ``lr=None``): the train path computes
        LR inside the compiled chunk instead (ops/resize.bicubic_down4),
        leaving only decode+crop on the host."""
        s = self.size
        hr = np.empty((n_steps, g_iter, bsz, s, s, 3), np.uint8)
        lr = (None if hr_only else
              np.empty((n_steps, g_iter, bsz, s // 4, s // 4, 3), np.uint8))
        total = len(self)
        jobs = [(i, g, b, int(rng.integers(0, total)),
                 rng.integers(0, 2 ** 31, size=3))
                for i in range(n_steps) for g in range(g_iter)
                for b in range(bsz)]

        def work(job):
            i, g, b, idx, seed = job
            local = np.random.default_rng(seed)
            crop = self._random_crop(self._load(idx), local)
            hr[i, g, b] = crop
            if not hr_only:
                lr[i, g, b] = self._bicubic_down4(crop)

        if workers and workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(workers) as pool:
                list(pool.map(work, jobs))
        else:
            for job in jobs:
                work(job)
        return lr, hr

    def park_images(self) -> np.ndarray:
        """Decode every image once and stack them (N, H, W, 3) uint8 for
        HBM parking (``dataset.park: true``): random crops then run on
        device inside the compiled chunk (data/parked.py). Requires a
        fixed crop size and one common image shape."""
        if self.size <= 0:
            raise ValueError("park requires a fixed crop size")
        if self.arrays is not None:
            imgs = np.asarray(self.arrays, np.uint8)
        else:
            decoded = [self._load(i) for i in range(len(self))]
            shapes = {im.shape for im in decoded}
            if len(shapes) != 1:
                raise ValueError(
                    f"dataset.park needs uniformly sized images; "
                    f"{self.name} has {len(shapes)} distinct shapes — "
                    "pre-resize the corpus or use the streaming path")
            imgs = np.stack(decoded)
        if imgs.shape[1] < self.size or imgs.shape[2] < self.size:
            pad_h = max(0, self.size - imgs.shape[1])
            pad_w = max(0, self.size - imgs.shape[2])
            imgs = np.pad(imgs, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                          mode="reflect")
        return imgs

    def iter_eval(self):
        """Yield (lr, hr) uint8 single-image batches, center-cropped to
        a multiple of 4 (reference _4xCenterCrop)."""
        for i in range(len(self)):
            img = self._load(i)
            h, w, _ = img.shape
            h4, w4 = (h // 4) * 4, (w // 4) * 4
            top, left = (h - h4) // 2, (w - w4) // 2
            hr = img[top:top + h4, left:left + w4]
            lr = self._bicubic_down4(hr)
            yield lr[None], hr[None]


def _file_loader(path: str, size: int = 96, name: str = "sr", **_):
    files = sorted(glob.glob(os.path.join(path, "**", "*"), recursive=True))
    files = [f for f in files if os.path.isfile(f)]
    if not files:
        raise FileNotFoundError(
            f"no images under {path} (no network egress; provide the "
            "dataset or use 'sr_synthetic')")
    return SRDataset(files, size, name=name)


for _name in ("imagenet", "set5", "set14", "bsd100"):
    DATASETS.register(_name)(
        lambda path, size=96, _n=_name, **kw: _file_loader(
            path, size, name=_n, **kw))


@DATASETS.register("sr_synthetic")
def sr_synthetic(path: str = "", size: int = 96, n: int = 64, **_):
    rng = np.random.default_rng(7)
    small = rng.integers(0, 256, (n, 16, 16, 3), dtype=np.uint8)
    from PIL import Image

    dim = max(size, 104) if size > 0 else 104
    arrays = np.stack([
        np.asarray(Image.fromarray(im).resize((dim, dim), Image.BILINEAR))
        for im in small])
    return SRDataset(None, size if size > 0 else -1, arrays=arrays,
                     name="sr_synthetic")
