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


# ---------------------------------------------------------------------------
# Golden-hash regression: freezes current PDQ numerics so any drift in
# iprgan_tpu/ops/pdq.py or native/pdq/pdq.cc fails loudly. The hashes
# feed ownership p-values (reference tools/phash_pvalue.py:19-38), so
# silent shifts would corrupt every claimed verification number.
# Inputs are numpy-only deterministic smooth images (low-frequency
# Fourier mixes) chosen so every DCT coefficient is >=1e-4 away from the
# median -- no floating-point tie-break sensitivity (degenerate images
# like pure gradients have exactly-zero coefficient clusters and flip
# dozens of bits between equally-correct implementations).
# ---------------------------------------------------------------------------

GOLDEN_HASHES_HEX = [
    "2baa0fffd5553040c1a82d72ce472d27c7ca21d9c2782f7ece1d2f48c0a2aade",
    "aaaa4fff3000e00819f3cd5f1552c6741eeec4771a9d4cf410a29abb1cbbcc5d",
    "d5540ffb328aaaaa545fc46e55a0ce485745ca5a51cb41555a28c6b5599adfea",
    "555df0084abff0000eebbee40f67b2b801aa9b8701edb4c50d2fb9a80cd6f5fa",
    "155dd555aaaa8fff73f554093007503a79dc51507aa85bd43507559c3a9173a3",
    "b0082aaa0fff0ffff010f481f3ecfc01f428fdaaf010f104f4d9ba1bfd389442",
    "8ffb600455550ffdf001a9c1f8d3aca1f6ae2017f18ca0d4ba7c2ed0a457369f",
    "0fff9555b0007004880c4a678fff4c5f897b4bb007434851814f4bdf9adf47df",
]


def _golden_images():
    """8 deterministic smooth 96x96 RGB images (low-freq Fourier mix)."""
    rng = np.random.default_rng(20260816)
    yy, xx = np.mgrid[0:96, 0:96].astype(np.float64) / 96.0
    imgs = []
    for _ in range(8):
        coef = rng.normal(size=(5, 5, 3))
        im = np.zeros((96, 96, 3))
        for p in range(5):
            for q in range(5):
                basis = np.cos(np.pi * p * yy) * np.cos(np.pi * q * xx)
                im += coef[p, q] * basis[..., None]
        lo, hi = im.min(), im.max()
        imgs.append((im - lo) / (hi - lo) * 255.0)
    return np.stack(imgs).astype(np.uint8)


def _hex(bits_row):
    return "".join(
        f"{int(''.join(str(int(b)) for b in bits_row[i:i + 8]), 2):02x}"
        for i in range(0, 256, 8))


def test_golden_hashes_numpy():
    h = pdq.compute_hash(_golden_images(), use_native=False)
    assert [_hex(row) for row in h] == GOLDEN_HASHES_HEX


def test_golden_hashes_native():
    if pdq._load_native() is False:
        pytest.skip("native PDQ not built")
    h = pdq.compute_hash(_golden_images(), use_native=True)
    assert [_hex(row) for row in h] == GOLDEN_HASHES_HEX


def test_golden_pvalue():
    imgs = _golden_images()
    a = imgs[:2].astype(np.float64) / 255.0
    # +5 brightness shift: DC-only change, and PDQ excludes the DC
    # coefficient -- hash is invariant, p-value underflows to 0.
    shifted = np.clip(imgs[0].astype(int) + 5, 0, 255) / 255.0
    b = np.stack([shifted, imgs[2].astype(np.float64) / 255.0])
    p = pdq.compute_matching_prob(a, b)
    assert p[0] == 0.0
    np.testing.assert_allclose(p[1], 3.54063697e-03, rtol=1e-5)
