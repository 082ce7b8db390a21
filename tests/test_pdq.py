"""PDQ hash: numpy vs native C++ bit-parity, robustness, p-value math."""

import numpy as np
import pytest
from scipy.stats import binom

from iprgan_tpu.ops import pdq


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    rng = np.random.default_rng(0)
    # smooth-ish images (perceptual hash needs structure, not white noise)
    small = rng.integers(0, 256, (6, 8, 8, 3), dtype=np.uint8)
    from PIL import Image

    out = np.stack([
        np.asarray(Image.fromarray(im).resize((64, 64), Image.BILINEAR))
        for im in small])
    return out


def test_numpy_native_agree(images):
    h_np = pdq.compute_hash(images, use_native=False)
    if pdq._load_native() is False:
        pytest.skip("native PDQ not built")
    h_cc = pdq.compute_hash(images, use_native=True)
    # The two implementations may disagree only on DCT coefficients that
    # are exact floating-point ties at the median (summation order);
    # these test images are degenerate (piecewise-constant upsamples)
    # with many exactly-zero coefficients — allow a few tie flips.
    dist = np.logical_xor(h_np, h_cc).sum(axis=1)
    assert np.all(dist <= 4), dist
    assert h_np.shape == (len(images), 256)
    # hashes are balanced-ish by construction (median threshold)
    counts = h_np.sum(1)
    assert np.all(counts >= 120) and np.all(counts <= 136)


def test_hash_robust_to_small_noise(images):
    im = images[0]
    noisy = np.clip(im.astype(int) + np.random.default_rng(1).integers(
        -8, 9, im.shape), 0, 255).astype(np.uint8)
    h1 = pdq.compute_hash(im[None], use_native=False)[0]
    h2 = pdq.compute_hash(noisy[None], use_native=False)[0]
    dist = np.logical_xor(h1, h2).sum()
    assert dist < 80  # perceptually similar -> small Hamming distance

    other = pdq.compute_hash(images[1][None], use_native=False)[0]
    assert np.logical_xor(h1, other).sum() > 90  # different images differ


def test_matching_prob(images):
    a = images[:4].astype(np.float32) / 255.0
    p_same = pdq.compute_matching_prob(a, a)
    assert p_same.shape == (4,)
    # identical images: all 256 bits match -> p = 0.5^256 ~ 0
    assert np.all(p_same < 1e-30)

    b = images[1:5].astype(np.float32) / 255.0
    p_diff = pdq.compute_matching_prob(a, b)
    assert np.all(p_diff > 1e-10)

    # formula check: p = 1 - BinomCDF(matches-1; 256, 0.5)
    ha = pdq.compute_hash(images[:1])
    hb = pdq.compute_hash(images[1:2])
    matches = 256 - np.logical_xor(ha, hb).sum()
    expected = 1 - binom(n=256, p=0.5).cdf(matches - 1)
    np.testing.assert_allclose(p_diff[0], expected, rtol=1e-5)


def test_tiny_images_upscaled():
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
    p = pdq.compute_matching_prob(a, a, min_size=32)
    assert np.all(p < 1e-30)  # identical after identical upscaling
