"""File-backed dataset loaders: CIFAR-10 pickles, CUB image folder with
npy cache, SR file globbing, cityscapes trainA/trainB pairs."""

import os
import pickle

import numpy as np
import pytest

from iprgan_tpu.data import get_dataset


def _write_fake_cifar(tmp_path, n_train=20, n_test=10):
    root = tmp_path / "cifar-10-batches-py"
    root.mkdir()
    rng = np.random.default_rng(0)

    def dump(name, n):
        data = rng.integers(0, 256, (n, 3072), dtype=np.uint8)
        with open(root / name, "wb") as f:
            pickle.dump({b"data": data, b"labels": [0] * n}, f)

    per = n_train // 5
    for i in range(1, 6):
        dump(f"data_batch_{i}", per)
    dump("test_batch", n_test)


def test_cifar10_loader(tmp_path):
    _write_fake_cifar(tmp_path)
    ds = get_dataset("cifar10", path=str(tmp_path), size=32)
    assert len(ds) == 30  # train + test concatenated (reference behavior)
    assert ds.images.shape == (30, 32, 32, 3)
    assert ds.images.dtype == np.uint8

    batches = list(ds.iter_eval(8))
    assert [len(b) for b in batches] == [8, 8, 8, 6]  # keeps last partial

    with pytest.raises(FileNotFoundError, match="CIFAR-10 not found"):
        get_dataset("cifar10", path=str(tmp_path / "nope"), size=32)


def test_cub200_loader_with_cache(tmp_path):
    from PIL import Image

    img_root = tmp_path / "CUB_200_2011" / "images" / "001.Some_Bird"
    img_root.mkdir(parents=True)
    rng = np.random.default_rng(1)
    for i in range(4):
        arr = rng.integers(0, 256, (50 + i * 7, 40, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_root / f"bird_{i}.jpg")

    ds = get_dataset("cub200", path=str(tmp_path), size=32)
    assert ds.images.shape == (4, 32, 32, 3)
    # second load hits the npy cache
    assert os.path.exists(tmp_path / "cub200_32.npy")
    ds2 = get_dataset("cub200", path=str(tmp_path), size=32)
    np.testing.assert_array_equal(ds.images, ds2.images)


def test_sr_file_loader(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(2)
    for i in range(3):
        arr = rng.integers(0, 256, (120, 140, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img_{i}.png")

    ds = get_dataset("imagenet", path=str(tmp_path), size=96)
    assert len(ds) == 3
    lr, hr = ds.sample_batches(np.random.default_rng(0), 2, 1, 2)
    assert hr.shape == (2, 1, 2, 96, 96, 3)
    assert lr.shape == (2, 1, 2, 24, 24, 3)

    # test mode: center crop to multiple of 4, 1/4 LR
    lr0, hr0 = next(iter(ds.iter_eval()))
    assert hr0.shape == (1, 120, 140, 3)
    assert lr0.shape == (1, 30, 35, 3)

    with pytest.raises(FileNotFoundError):
        get_dataset("set5", path=str(tmp_path / "missing"), size=96)


def test_cityscapes_loader(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(3)
    for sub, n in (("trainA", 3), ("trainB", 2), ("testA", 2), ("testB", 2)):
        d = tmp_path / sub
        d.mkdir()
        for i in range(n):
            arr = rng.integers(0, 256, (150, 200, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")

    ds = get_dataset("cityscapes", path=str(tmp_path), load=143, crop=128)
    assert len(ds) == 3  # max(|A|, |B|)
    a, b = ds.sample_batches(np.random.default_rng(0), 1, 1, 2)
    assert a.shape == (1, 1, 2, 128, 128, 3)
    assert b.shape == (1, 1, 2, 128, 128, 3)

    ds_test = get_dataset("cityscapes", path=str(tmp_path), load=143,
                          crop=128, test=True)
    a0, b0 = next(iter(ds_test.iter_eval()))
    assert a0.shape == (1, 128, 128, 3)


def test_device_bicubic_down4_matches_pil():
    """ops/resize.bicubic_down4 (the in-chunk LR producer) reproduces the
    reference's PIL bicubic 1/4 (datasets/sr_datasets.py:7-42) within one
    uint8 level (PIL rounds to uint8 per pass; we stay float32)."""
    import jax.numpy as jnp
    from PIL import Image

    from iprgan_tpu.ops.resize import bicubic_down4

    rng = np.random.default_rng(3)
    small = rng.integers(0, 256, (16, 16, 3), np.uint8)
    hr = np.asarray(Image.fromarray(small).resize((96, 96), Image.BILINEAR))

    ref = np.asarray(Image.fromarray(hr).resize((24, 24), Image.BICUBIC),
                     np.float64)
    out = np.asarray(bicubic_down4(
        jnp.asarray(hr, jnp.float32)[None])[0]).astype(np.float64)
    assert out.shape == (24, 24, 3)
    assert np.max(np.abs(out - ref)) <= 1.0 + 1e-3


def test_cub200_metadata_split_order(tmp_path):
    """cub200 honors images.txt + train_test_split.txt: train images (in
    images.txt order) then test images (reference img_datasets.py:75-165
    + train/test concat)."""
    from PIL import Image

    from iprgan_tpu.data.datasets import cub200

    root = tmp_path / "CUB_200_2011"
    (root / "images" / "001.sp").mkdir(parents=True)
    # 4 images with distinct solid colors to track ordering
    colors = {"a": 10, "b": 60, "c": 120, "d": 200}
    for name, v in colors.items():
        Image.fromarray(np.full((20, 20, 3), v, np.uint8)).save(
            root / "images" / "001.sp" / f"{name}.jpg")
    (root / "images.txt").write_text(
        "1 001.sp/c.jpg\n2 001.sp/a.jpg\n3 001.sp/d.jpg\n4 001.sp/b.jpg\n")
    # train: ids 2, 3 (a, d); test: ids 1, 4 (c, b)
    (root / "train_test_split.txt").write_text(
        "1 0\n2 1\n3 1\n4 0\n")

    ds = cub200(str(tmp_path), size=8)
    got = [int(im[4, 4, 0]) for im in ds.images]
    # jpeg is lossy: match to the nearest color
    keys = list(colors)
    order = [min(keys, key=lambda k: abs(colors[k] - g)) for g in got]
    assert order == ["a", "d", "c", "b"]

    # second load hits the npy cache with identical content
    ds2 = cub200(str(tmp_path), size=8)
    np.testing.assert_array_equal(ds.images, ds2.images)


def test_unaligned_halfsat_invertibility():
    """unaligned_synthetic_halfsat: domain B is saturation-halved, so the
    exact source image is recoverable as 2B - mean_c(B) (the property
    that makes the CycleGAN bbox demo's cycle/identity losses exactly
    satisfiable — configs/demos/cyclegan-bbox-demo.yaml)."""
    from iprgan_tpu.data.unaligned_datasets import (
        unaligned_synthetic_halfsat)

    ds = unaligned_synthetic_halfsat(load=32, crop=16, n=4)
    a, b = ds.arrays_a, ds.arrays_b
    assert a.shape == b.shape == (4, 40, 40, 3)
    assert a.dtype == b.dtype == np.uint8

    # B really is half-saturated: channel spread shrinks by ~2
    spread = lambda x: np.mean(x.max(-1) - x.min(-1))  # noqa: E731
    assert spread(b) < 0.6 * spread(a)

    # invertibility: 2B - mean_c(B) recovers an actual full-sat blob
    # image (B was built from an independent draw with the same seed
    # stream, so recover it from B itself, up to uint8 rounding)
    bf = b.astype(np.float32)
    rec = 2.0 * bf - bf.mean(-1, keepdims=True)
    assert rec.min() > -2.0 and rec.max() < 257.0
    # recovered image must have domain-A-level saturation
    assert spread(np.clip(rec, 0, 255)) > 0.9 * spread(a)
