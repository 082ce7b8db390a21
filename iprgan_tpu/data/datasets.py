"""Datasets (reference datasets/).

TPU-first design: small image datasets (CIFAR-10 / CUB-200 / synthetic)
are materialized once as a uint8 (N, H, W, C) array and parked in device
HBM; training steps then sample batches *on device* with jax.random
indices and normalize to [-1,1] inside the compiled step — there is no
per-step host->device transfer at all (the reference pays a DataLoader
worker-process hop plus a DataParallel scatter per step).

Differences vs the reference, by design:
* training batches are sampled i.i.d. with replacement instead of
  shuffled epochs (immaterial for GAN training; eval iterates the full
  set in order exactly like the reference);
* no download path — this environment has no network egress. Loaders
  read the standard on-disk formats and raise a clear error when absent;
  the ``synthetic`` dataset serves tests and benchmarks.

Streaming datasets (SR crops, unaligned pairs) are in sr_datasets.py /
unaligned_datasets.py.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Iterator

import numpy as np

from iprgan_tpu.registry import DATASETS


class ArrayDataset:
    """In-memory uint8 image dataset with device-side sampling support."""

    def __init__(self, images: np.ndarray, name: str = "array"):
        assert images.dtype == np.uint8 and images.ndim == 4
        self.images = images
        self.name = name

    def __len__(self) -> int:
        return len(self.images)

    @property
    def image_size(self) -> int:
        return self.images.shape[1]

    def iter_eval(self, batch_size: int) -> Iterator[np.ndarray]:
        """Sequential batches, no shuffle, keep last partial batch
        (reference eval loader: shuffle=False, drop_last=False)."""
        for i in range(0, len(self.images), batch_size):
            yield self.images[i:i + batch_size]

    def sample_host(self, rng: np.random.Generator, shape) -> np.ndarray:
        """Random batch stack for host-fed training: shape = (steps, d_iter, B)."""
        idx = rng.integers(0, len(self.images), size=shape)
        return self.images[idx]


def _resize_batch(images: np.ndarray, size: int) -> np.ndarray:
    if images.shape[1] == size:
        return images
    from PIL import Image

    out = np.empty((len(images), size, size, images.shape[3]), np.uint8)
    for i, img in enumerate(images):
        out[i] = np.asarray(
            Image.fromarray(img).resize((size, size), Image.BILINEAR))
    return out


@DATASETS.register("cifar10")
def cifar10(path: str, size: int = 32, **_):
    """CIFAR-10 train+test concatenated (reference
    datasets/img_datasets.py:10-40), read from the standard
    ``cifar-10-batches-py`` pickle files under ``path``."""
    root = os.path.join(path, "cifar-10-batches-py")
    if not os.path.isdir(root):
        raise FileNotFoundError(
            f"CIFAR-10 not found at {root}. Place the extracted "
            "'cifar-10-batches-py' directory there (no network egress in "
            "this environment), or use dataset name 'synthetic'.")
    arrays = []
    for fname in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
        with open(os.path.join(root, fname), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        arrays.append(np.asarray(d[b"data"], np.uint8))
    raw = np.concatenate(arrays, 0).reshape(-1, 3, 32, 32)
    images = np.transpose(raw, (0, 2, 3, 1)).copy()  # NCHW -> NHWC
    return ArrayDataset(_resize_batch(images, size), "cifar10")


def _cub_metadata_files(root: str):
    """File list in reference order (datasets/img_datasets.py:75-165 +
    train/test concatenation): images.txt gives img_id -> relpath,
    train_test_split.txt partitions; the concatenated dataset is all
    training images (in images.txt order) followed by all test images."""
    img_txt = os.path.join(root, "images.txt")
    split_txt = os.path.join(root, "train_test_split.txt")
    if not (os.path.exists(img_txt) and os.path.exists(split_txt)):
        return None
    paths = {}
    for line in open(img_txt):
        img_id, rel = line.split()
        paths[img_id] = rel
    train, test = [], []
    for line in open(split_txt):
        img_id, is_train = line.split()
        (train if int(is_train) else test).append(
            os.path.join(root, "images", paths[img_id]))
    return train + test


@DATASETS.register("cub200")
def cub200(path: str, size: int = 32, **_):
    """CUB-200-2011 train+test (reference datasets/img_datasets.py:42-73):
    resize shorter side then center crop. Cached as npy after first load.
    Reads the metadata CSVs (images.txt / train_test_split.txt) for
    reference file ordering, falling back to a sorted folder walk when
    the metadata is absent."""
    cache = os.path.join(path, f"cub200_{size}.npy")
    if os.path.exists(cache):
        return ArrayDataset(np.load(cache), "cub200")

    root = os.path.join(path, "CUB_200_2011")
    img_root = os.path.join(root, "images")
    if not os.path.isdir(img_root):
        raise FileNotFoundError(
            f"CUB-200-2011 not found at {img_root} (no network egress; "
            "provide the extracted dataset or use 'synthetic').")
    from PIL import Image

    files = _cub_metadata_files(root)
    if files is None:
        files = []
        for dirpath, _, fnames in os.walk(img_root):
            files += [os.path.join(dirpath, f) for f in fnames
                      if f.lower().endswith((".jpg", ".jpeg", ".png"))]
        files.sort()
    out = np.empty((len(files), size, size, 3), np.uint8)
    for i, fp in enumerate(files):
        img = Image.open(fp).convert("RGB")
        w, h = img.size
        scale = size / min(w, h)
        img = img.resize((round(w * scale), round(h * scale)), Image.BILINEAR)
        w, h = img.size
        left, top = (w - size) // 2, (h - size) // 2
        out[i] = np.asarray(img.crop((left, top, left + size, top + size)))
    np.save(cache, out)
    return ArrayDataset(out, "cub200")


@DATASETS.register("synthetic")
def synthetic(path: str = "", size: int = 32, n: int = 2048, **_):
    """Deterministic random images for tests and throughput benchmarks."""
    seed = int(hashlib.md5(f"{size}x{n}".encode()).hexdigest()[:8], 16)
    rng = np.random.default_rng(seed)
    # smooth blobs rather than white noise so SSIM/FID are non-degenerate
    base = rng.integers(0, 256, size=(n, 8, 8, 3), dtype=np.uint8)
    images = _resize_batch(base, size)
    return ArrayDataset(images, "synthetic")


def get_dataset(name: str, **kwargs):
    return DATASETS(name)(**kwargs)
