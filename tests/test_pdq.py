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


# ---------------------------------------------------------------------------
# Independent spec derivation: a from-scratch transliteration of the
# published TMK+PDQF pipeline (REC601 luma -> two-pass truncated-border
# box filter with window (old + 2*64 - 1)//(2*64) -> center-point
# decimation to 64x64 -> orthonormal DCT-II, frequencies 1..16 -> median
# threshold) using scipy's DCT and an explicit per-pixel window mean.
# Bit-exact agreement with iprgan_tpu/ops/pdq.py on the golden images
# means the goldens pin the SPEC, not one implementation's quirks.
# ---------------------------------------------------------------------------


def _naive_spec_hash(img_u8):
    from scipy.fft import dct as scipy_dct

    f = img_u8.astype(np.float64)
    luma = f[..., 0] * 0.299 + f[..., 1] * 0.587 + f[..., 2] * 0.114
    h, w = luma.shape
    wy = max(1, (h + 127) // 128)
    wx = max(1, (w + 127) // 128)
    buf = luma
    for _ in range(2):  # nreps = 2
        for axis, win in ((0, wy), (1, wx)):
            x = np.moveaxis(buf, axis, 0)
            n = x.shape[0]
            lo, hi = win // 2, win - win // 2
            out = np.empty_like(x)
            for i in range(n):  # truncated-border window mean
                out[i] = x[max(0, i - lo):min(n, i + hi)].mean(axis=0)
            buf = np.moveaxis(out, 0, axis)
    yi = np.minimum(((np.arange(64) + 0.5) * h / 64).astype(int), h - 1)
    xi = np.minimum(((np.arange(64) + 0.5) * w / 64).astype(int), w - 1)
    block = buf[np.ix_(yi, xi)]
    d = scipy_dct(scipy_dct(block, axis=0, norm="ortho"),
                  axis=1, norm="ortho")[1:17, 1:17]
    return (d > np.median(d)).reshape(-1)


def test_spec_independent_derivation():
    imgs = _golden_images()
    ours = pdq.compute_hash(imgs, use_native=False)
    for i, im in enumerate(imgs):
        assert np.array_equal(ours[i], _naive_spec_hash(im)), f"image {i}"


# ---------------------------------------------------------------------------
# Perceptual-quality properties on photo-like content. The golden images
# above are deliberately smooth (tie-break-free), which makes them
# DEGENERATE for stability: most of their 16x16 DCT coefficients are
# ~zero, so bits near the median flip freely under resampling. These
# multi-scale images (1/f spectrum + hard edges) exercise the property
# PDQ is built for: hashes survive rescaling, distinct images differ.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def photo_like():
    rng = np.random.default_rng(42)
    size = 256
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64) / size
    imgs = []
    for _ in range(6):
        im = np.zeros((size, size, 3))
        for p in range(0, 25, 2):  # 1/f-ish spectrum up to order 24
            for q in range(0, 25, 2):
                if p == q == 0:
                    continue
                amp = 1.0 / (p * p + q * q) ** 0.75
                ph1, ph2 = rng.uniform(0, 2 * np.pi, 2)
                basis = (np.cos(2 * np.pi * p * yy + ph1)
                         * np.cos(2 * np.pi * q * xx + ph2))
                im += amp * basis[..., None] * rng.normal(size=3)
        for _ in range(4):  # hard-edged rectangles
            y0, x0 = rng.integers(0, size - 40, 2)
            hgt, wid = rng.integers(20, 80, 2)
            im[y0:y0 + hgt, x0:x0 + wid] += rng.normal(size=3) * 0.5
        lo, hi = im.min(), im.max()
        imgs.append((im - lo) / (hi - lo) * 255.0)
    return np.stack(imgs).astype(np.uint8)


def test_downscale_stability(photo_like):
    """Rescaling is the canonical PDQ-preserving transform (the whole
    pipeline starts by downsampling to 64x64). Observed distances on
    these images: 2-28 bits; threshold 48 = match p-value < 1e-26."""
    from PIL import Image

    base = pdq.compute_hash(photo_like, use_native=False)
    for size in (512, 192, 128, 96, 64):
        scaled = np.stack([
            np.asarray(Image.fromarray(im).resize((size, size),
                                                  Image.BICUBIC))
            for im in photo_like])
        dist = np.logical_xor(
            base, pdq.compute_hash(scaled, use_native=False)).sum(axis=1)
        assert np.all(dist <= 48), (size, dist)


def test_distinct_images_near_random_distance(photo_like):
    h = pdq.compute_hash(photo_like, use_native=False)
    for i in range(len(h)):
        for j in range(i + 1, len(h)):
            d = np.logical_xor(h[i], h[j]).sum()
            assert 90 <= d <= 166, (i, j, d)


def test_brightness_contrast_invariance(photo_like):
    """DC exclusion + median threshold make the hash invariant to
    affine luma changes (up to uint8 rounding)."""
    im = photo_like[0]
    h0 = pdq.compute_hash(im[None], use_native=False)[0]
    bright = np.clip(im.astype(int) + 24, 0, 235).astype(np.uint8)
    contr = np.clip(im.astype(np.float64) * 0.8 + 20, 0, 255).astype(
        np.uint8)
    for variant in (bright, contr):
        hv = pdq.compute_hash(variant[None], use_native=False)[0]
        assert np.logical_xor(h0, hv).sum() <= 24
