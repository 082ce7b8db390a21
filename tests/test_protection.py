"""Tests for trigger transforms, sign signatures, and loss factories."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import norm

from iprgan_tpu.config import Config
from iprgan_tpu.protection import (
    BitGenerator,
    compute_ber,
    embed_signs,
    iter_norm_scale_paths,
    make_loss,
    make_transform,
    sign_loss,
)
from iprgan_tpu.ops.ssim import ssim


def test_bit_generator_matches_reference_algorithm():
    # 'A' = 0x41 -> 01000001, tab = 00001001; stream cycles
    gen = BitGenerator("A")
    bits = gen.get(16)
    assert bits == [0, 1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 0, 1]
    assert gen.get(3) == [0, 1, 0]  # wraps around

    # random mode produces only 0/1
    rgen = BitGenerator(None)
    assert set(rgen.get(100)) <= {0, 1}


def test_transform_dist():
    cfg = Config({"type": "TransformDist"})
    t = make_transform(cfg, normalized=True)
    z = jnp.asarray(np.random.default_rng(0).normal(size=(4, 128)),
                    jnp.float32)
    y = np.asarray(t(t.init_buffers(), z))
    expected = norm.cdf(np.asarray(z)) * math.sqrt(2 * math.pi)
    np.testing.assert_allclose(y, expected, atol=1e-5)
    assert y.min() >= 0 and y.max() <= math.sqrt(2 * math.pi)


def test_random_bitmask():
    cfg = Config({"type": "RandomBitMask", "n_bit": 16, "constant": 3.0,
                  "z_dim": 128})
    t = make_transform(cfg, normalized=True)
    buf = t.init_buffers(jax.random.PRNGKey(0))
    assert buf["_mask"].shape == (16,)
    z = jnp.zeros((2, 128))
    y = np.asarray(t(buf, z))
    assert (y == 3.0).sum() == 2 * 16
    # reset draws a different mask
    buf2 = t.reset(jax.random.PRNGKey(1))
    assert not np.array_equal(np.asarray(buf["_mask"]),
                              np.asarray(buf2["_mask"]))


def test_transform_var():
    cfg = Config({"type": "TransformVar"})
    t = make_transform(cfg, normalized=True)
    buf = t.init_buffers(jax.random.PRNGKey(0))
    z = jnp.ones((3, 128))
    y = np.asarray(t(buf, z))
    a = np.asarray(buf["a"])
    w = np.asarray(buf["w"])
    expected = np.broadcast_to(1 * (1 - a) + a * w, y.shape)
    np.testing.assert_allclose(y, expected, rtol=1e-6)


def test_random_noise_patch_paste_and_mask():
    cfg = Config({"type": "RandomNoisePatch", "size": 4})
    t = make_transform(cfg, normalized=False)
    buf = t.init_buffers(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 8, 8, 3))
    y = np.asarray(t(buf, x))
    fg = np.asarray(buf["fg"])
    # top-left corner replaced by fg (bg == 0 -> opaque)
    np.testing.assert_allclose(y[0, :4, :4, :], fg, rtol=1e-6)
    assert np.all(y[0, 4:, :, :] == 0) and np.all(y[0, :, 4:, :] == 0)
    # comparator crops the corner
    m = np.asarray(t.apply_mask(buf, y))
    np.testing.assert_allclose(m[0], fg, rtol=1e-6)


def test_paste_watermark_from_png(tmp_path):
    from PIL import Image

    # half-transparent watermark: left half red opaque, right transparent
    wm = np.zeros((8, 8, 4), np.uint8)
    wm[:, :4] = [255, 0, 0, 255]
    p = tmp_path / "wm.png"
    Image.fromarray(wm).save(p)

    cfg = Config({"type": "PasteWatermark", "size": 8, "opaque": False,
                  "watermark": str(p), "position": "br"})
    t = make_transform(cfg, normalized=False)
    buf = t.init_buffers()
    fg, bg = np.asarray(buf["fg"]), np.asarray(buf["bg"])
    # left half: red on white composite; right half: white, bg mask 1
    np.testing.assert_allclose(
        fg[:, :4], np.broadcast_to([1.0, 0, 0], (8, 4, 3)), atol=0.02)
    assert np.all(bg[:, :4] == 0) and np.all(bg[:, 4:] == 1)

    x = jnp.full((1, 16, 16, 3), 0.5)
    y = np.asarray(t(buf, x))
    # bottom-right corner, left half of the patch is red
    np.testing.assert_allclose(
        y[0, 8:, 8:12], np.broadcast_to([1.0, 0, 0], (8, 4, 3)), atol=0.02)
    np.testing.assert_allclose(y[0, 8:, 12:], 0.5, atol=1e-6)
    np.testing.assert_allclose(y[0, :8], 0.5, atol=1e-6)

    # opaque replaces the full square
    cfg2 = Config({"type": "PasteWatermark", "size": 8, "opaque": True,
                   "watermark": str(p), "position": "tl"})
    t2 = make_transform(cfg2, normalized=True)
    buf2 = t2.init_buffers()
    assert np.all(np.asarray(buf2["bg"]) == 0)
    # normalized fg lives in [-1, 1]
    assert np.asarray(buf2["fg"]).min() >= -1.0001


def test_sign_embed_loss_ber():
    params = {
        "norm0": {"scale": jnp.asarray(np.random.randn(8), jnp.float32),
                  "bias": jnp.zeros(8)},
        "block": {"norm1": {"scale": jnp.full((4,), -0.5)},
                  "conv": {"kernel": jnp.ones((3, 3, 1, 1))}},
    }
    paths = iter_norm_scale_paths(params)
    assert paths == [("block", "norm1", "scale"), ("norm0", "scale")]

    new_params, signs = embed_signs(params, "EXAMPLE A")
    assert set(signs) == {"block_norm1_scale", "norm0_scale"}
    # signs embedded: w = |w| * sign, BER == 0, loss small for gamma_0 <= |w|
    assert float(compute_ber(new_params, signs)) == 0.0
    w = np.asarray(new_params["norm0"]["scale"])
    s = np.asarray(signs["norm0_scale"])
    np.testing.assert_allclose(np.sign(w), s, rtol=0)

    loss0 = float(sign_loss(new_params, signs, gamma_0=0.0))
    assert loss0 == 0.0
    # large gamma pushes hinge on
    loss1 = float(sign_loss(new_params, signs, gamma_0=10.0))
    assert loss1 > 0

    # flipping all signs gives BER 1
    flipped = jax.tree_util.tree_map(lambda x: -x, new_params)
    assert float(compute_ber(flipped, signs)) == 1.0


def test_loss_factories():
    gen = np.random.default_rng(0)
    x = jnp.asarray(gen.uniform(-1, 1, (2, 16, 16, 3)), jnp.float32)
    # ms_ssim needs > (win-1)*2^4 px for its 5 scales
    x_big = jnp.asarray(gen.uniform(-1, 1, (1, 176, 176, 3)), jnp.float32)
    for name in ("l1", "mse", "ssim", "ms_ssim"):
        inp = x_big if name == "ms_ssim" else x
        fn = make_loss(name, normalized=True)
        v = float(fn(inp, inp))
        assert v == pytest.approx(0.0, abs=1e-5), name
        v2 = float(fn(inp, jnp.clip(inp + 0.5, -1, 1)))
        assert v2 > 0, name


def _ssim_numpy(a, b, data_range=1.0, win=11, sigma=1.5):
    """Direct SSIM reference: gaussian window, valid conv, per channel."""
    from scipy.signal import convolve2d

    coords = np.arange(win) - win // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    w2d = np.outer(g, g)
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2

    def blur(x):
        return convolve2d(x, w2d, mode="valid")

    vals = []
    for c in range(a.shape[-1]):
        x, y = a[..., c].astype(np.float64), b[..., c].astype(np.float64)
        mu1, mu2 = blur(x), blur(y)
        s1 = blur(x * x) - mu1 ** 2
        s2 = blur(y * y) - mu2 ** 2
        s12 = blur(x * y) - mu1 * mu2
        m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
            (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))
        vals.append(m.mean())
    return float(np.mean(vals))


def test_ssim_against_numpy_reference():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)

    ours = float(ssim(jnp.asarray(a), jnp.asarray(b), data_range=1.0))
    ref = _ssim_numpy(a[0], b[0])
    assert abs(ours - ref) < 1e-4

    assert float(ssim(jnp.asarray(a), jnp.asarray(a))) == pytest.approx(1.0, abs=1e-5)
    per_image = ssim(jnp.asarray(np.repeat(a, 3, 0)),
                     jnp.asarray(np.repeat(b, 3, 0)), size_average=False)
    assert per_image.shape == (3,)


def test_ssim_bounded_on_flat_windows():
    """SSIM must stay inside [-1, 1] even on images dominated by flat
    regions (sigma^2 ~ 0), where reduced-precision conv moments turn the
    cs denominator negative. On XLA:TPU the default f32 conv precision
    produced SSIM = -28 on a real watermark-region crop (white field of
    the pasted watermark target) until ops/ssim.py pinned
    precision=HIGHEST and clamped sigma^2 >= 0; this pins the bound on
    every backend."""
    rng = np.random.default_rng(7)
    # mostly flat white with a small structured patch, like a watermark
    # target region; the comparison image is flat where x is flat
    x = np.ones((4, 64, 64, 3), np.float32)
    y = np.ones((4, 64, 64, 3), np.float32)
    x[:, 20:40, 20:40] = rng.uniform(0, 1, (4, 20, 20, 3))
    y[:, 24:44, 24:44] = rng.uniform(0, 1, (4, 20, 20, 3))

    q = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y),
                        data_range=1.0, size_average=False))
    assert q.shape == (4,)
    assert np.all(q >= -1.0) and np.all(q <= 1.0)
    # flat-vs-flat background dominates: similarity should be high
    assert np.all(q > 0.5)
