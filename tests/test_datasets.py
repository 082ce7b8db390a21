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
