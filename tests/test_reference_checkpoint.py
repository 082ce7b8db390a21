"""Numerical parity of the reference-checkpoint converter
(scripts/convert_reference_checkpoint.py).

The torch side of every network is rebuilt here from the published
reference architecture (state-dict compatible with
reference networks/*.py — same attribute names, so the key layout
matches exactly what a real ``checkpoint.pt`` contains, including the
DataParallel ``module.`` prefix in the full-checkpoint tests). Each test
random-initializes the torch net (weights, BN running stats,
spectral-norm vectors), runs a torch eval-mode forward, converts the
state dict, runs the flax module on the same input, and asserts the
outputs agree — so any mapping or permutation bug fails numerically.

The sign-buffer tests cover the subtle part: the reference enumerates
norm layers in named_modules document order (head first,
tools/sign_model.py:33-40) while this framework sorts flattened paths
(down* before head*), so the converter must map per layer, not by
position — asserted by BER == 0 on the converted (params, signs).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from scripts.convert_reference_checkpoint import (  # noqa: E402
    NET_CONVERTERS,
    convert,
    convert_pool,
    convert_sign,
    convert_transform_buffers,
    strip_module,
)

from iprgan_tpu.config import Config  # noqa: E402
from iprgan_tpu.protection.sign import compute_ber  # noqa: E402


# ---------------------------------------------------------------------------
# torch-side reference architectures (reference networks/*.py key layouts)
# ---------------------------------------------------------------------------

class TConvGenerator(tnn.Module):
    """reference networks/conv_generator.py:3-33 key layout."""

    def __init__(self, mg):
        super().__init__()
        self.mg = mg
        blk = lambda i, o: tnn.Sequential(  # noqa: E731
            tnn.ConvTranspose2d(i, o, 4, 2, 1, bias=False),
            tnn.BatchNorm2d(o), tnn.ReLU(True))
        self.fc = tnn.Sequential(tnn.Linear(128, 512 * mg * mg),
                                 tnn.ReLU(True))
        self.convs = tnn.Sequential(
            blk(512, 256), blk(256, 128), blk(128, 64),
            tnn.ConvTranspose2d(64, 3, 3, 1, 1, bias=False), tnn.Tanh())

    def forward(self, z):
        h = self.fc(z).view(z.size(0), -1, self.mg, self.mg)
        return self.convs(h)


class TSNDiscriminator(tnn.Module):
    """reference networks/sn_discriminator.py:4-38 key layout."""

    def __init__(self, md):
        super().__init__()
        SN = tnn.utils.spectral_norm
        blk = lambda i, o: tnn.Sequential(  # noqa: E731
            SN(tnn.Conv2d(i, o, 3, 1, 1)), tnn.LeakyReLU(0.1, True),
            SN(tnn.Conv2d(o, o, 4, 2, 1)), tnn.LeakyReLU(0.1, True))
        self.net = tnn.Sequential(
            blk(3, 64), blk(64, 128), blk(128, 256),
            SN(tnn.Conv2d(256, 512, 3, 1, 1)), tnn.LeakyReLU(0.1, True),
            tnn.Flatten(), SN(tnn.Linear(512 * md * md, 1)))

    def forward(self, x):
        return self.net(x).view(-1)


def t_decoder32():
    """reference networks/decoder.py key layout (indices 0,2,3,5,6,8)."""

    class Reshape(tnn.Module):
        def forward(self, x):
            return x.view(-1, 128, 4, 4)

    class Norm(tnn.Module):
        def forward(self, x):
            return x * 2 - 1

    return tnn.Sequential(
        tnn.Linear(128, 2048), Reshape(),
        tnn.ConvTranspose2d(128, 64, 4, 2, 1), tnn.BatchNorm2d(64),
        tnn.ReLU(True),
        tnn.ConvTranspose2d(64, 32, 4, 2, 1), tnn.BatchNorm2d(32),
        tnn.ReLU(True),
        tnn.ConvTranspose2d(32, 3, 4, 2, 1), tnn.Sigmoid(), Norm())


class TEncoder32(tnn.Module):
    """reference networks/encoder.py key layout."""

    def __init__(self):
        super().__init__()
        self.encoder = tnn.Sequential(
            tnn.Conv2d(3, 32, 3, 2, 1), tnn.BatchNorm2d(32), tnn.ReLU(True),
            tnn.Conv2d(32, 64, 3, 2, 1), tnn.BatchNorm2d(64), tnn.ReLU(True),
            tnn.Conv2d(64, 128, 3, 2, 1))
        self.q_mean = tnn.Linear(2048, 128)
        self.q_logvar = tnn.Linear(2048, 128)

    def forward(self, x):
        q = self.encoder(x).flatten(start_dim=1)
        return self.q_mean(q), self.q_logvar(q)


def _t_conv_block(cin, cout, k, s, p, n=False, act=None):
    layers = [tnn.Conv2d(cin, cout, k, s, p)]
    if n:
        layers.append(tnn.BatchNorm2d(cout))
    if act is not None:
        layers.append(act)
    return tnn.Sequential(*layers)


class _TResBlock(tnn.Module):
    def __init__(self, block):
        super().__init__()
        self.block = block

    def forward(self, x):
        return x + self.block(x)


def t_sr_resnet(n_block):
    """reference networks/sr_resnet.py key layout (1.block.{i}.block...)."""
    res = [_TResBlock(tnn.Sequential(
        _t_conv_block(64, 64, 3, 1, 1, n=True, act=tnn.PReLU()),
        _t_conv_block(64, 64, 3, 1, 1, n=True))) for _ in range(n_block)]
    res.append(_t_conv_block(64, 64, 3, 1, 1, n=True))
    up = lambda: tnn.Sequential(  # noqa: E731
        _t_conv_block(64, 256, 3, 1, 1), tnn.PixelShuffle(2), tnn.PReLU())
    return tnn.Sequential(
        _t_conv_block(3, 64, 9, 1, 4, act=tnn.PReLU()),
        _TResBlock(tnn.Sequential(*res)), up(), up(),
        _t_conv_block(64, 3, 9, 1, 4))


def t_discriminator96():
    """reference networks/discriminator_96.py key layout."""
    cb = lambda i, o, s: tnn.Sequential(  # noqa: E731
        tnn.Conv2d(i, o, 3, s, 1), tnn.BatchNorm2d(o),
        tnn.LeakyReLU(0.2, True))
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 3, 1, 1), tnn.LeakyReLU(0.2, True),
        cb(64, 64, 2), cb(64, 128, 1), cb(128, 128, 2), cb(128, 256, 1),
        cb(256, 256, 2), cb(256, 512, 1), cb(512, 512, 2),
        tnn.Conv2d(512, 1024, 6, 1, 0), tnn.LeakyReLU(0.2, True),
        tnn.Conv2d(1024, 1, 1, 1, 0))


class _TINResBlock(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.block = tnn.Sequential(
            tnn.ReflectionPad2d(1), tnn.Conv2d(ch, ch, 3, 1, 0),
            tnn.InstanceNorm2d(ch, affine=True), tnn.ReLU(True),
            tnn.ReflectionPad2d(1), tnn.Conv2d(ch, ch, 3, 1, 0),
            tnn.InstanceNorm2d(ch, affine=True))

    def forward(self, x):
        return x + self.block(x)


def t_resnet_generator(n_block):
    """reference networks/resnet_generator.py key layout."""
    model = [tnn.ReflectionPad2d(3), tnn.Conv2d(3, 64, 7, 1, 0),
             tnn.InstanceNorm2d(64, affine=True), tnn.ReLU(True)]
    for i in range(2):
        ch = 2 ** (i + 6)
        model += [tnn.Conv2d(ch, ch * 2, 3, 2, 1),
                  tnn.InstanceNorm2d(ch * 2, affine=True), tnn.ReLU(True)]
    model += [_TINResBlock(256) for _ in range(n_block)]
    for i in range(2):
        ch = 2 ** (8 - i)
        model += [tnn.ConvTranspose2d(ch, ch // 2, 3, 2, 1, output_padding=1),
                  tnn.InstanceNorm2d(ch // 2, affine=True), tnn.ReLU(True)]
    model += [tnn.ReflectionPad2d(3), tnn.Conv2d(64, 3, 7, 1, 0), tnn.Tanh()]
    return tnn.Sequential(*model)


def t_conv_discriminator():
    """reference networks/conv_discriminator.py key layout."""
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 4, 2, 1), tnn.LeakyReLU(0.2, True),
        tnn.Conv2d(64, 128, 4, 2, 1), tnn.InstanceNorm2d(128),
        tnn.LeakyReLU(0.2, True),
        tnn.Conv2d(128, 256, 4, 2, 1), tnn.InstanceNorm2d(256),
        tnn.LeakyReLU(0.2, True),
        tnn.Conv2d(256, 512, 4, 1, 1), tnn.InstanceNorm2d(512),
        tnn.LeakyReLU(0.2, True),
        tnn.Conv2d(512, 1, 4, 1, 1))


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def randomize(net, seed=0):
    """Random weights + realistic BN running stats (eval mode uses them,
    so a wrong mean/var mapping fails loudly)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5)
    return net


def np_sd(net):
    return {k: v.detach().numpy() for k, v in net.state_dict().items()
            if not k.endswith("num_batches_tracked")}


def nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def _assert_close(ours, theirs, atol=2e-4):
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=atol, rtol=1e-3)


# ---------------------------------------------------------------------------
# per-network forward parity
# ---------------------------------------------------------------------------

def test_conv_generator_parity():
    net = randomize(TConvGenerator(mg=4)).eval()
    z = np.random.default_rng(0).normal(size=(2, 128)).astype(np.float32)
    ref = net(torch.from_numpy(z)).detach().numpy()

    variables, sign_map = NET_CONVERTERS["ConvGenerator32"](np_sd(net))
    from iprgan_tpu.networks.conv_generator import ConvGenerator

    y = ConvGenerator(mg=4).apply(variables, z, train=False)
    _assert_close(nchw(np.asarray(y)), ref)
    assert set(sign_map.values()) == {
        "norm0_bn_scale", "norm1_bn_scale", "norm2_bn_scale"}


def test_sn_discriminator_parity():
    net = randomize(TSNDiscriminator(md=4))
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    net.train()
    net(torch.from_numpy(x))  # settle the power-iteration vectors
    net.eval()
    ref = net(torch.from_numpy(x)).detach().numpy()

    variables, _ = NET_CONVERTERS["SNDiscriminator32"](np_sd(net))
    from iprgan_tpu.networks.sn_discriminator import SNDiscriminator

    y = SNDiscriminator(md=4).apply(
        variables, np.transpose(x, (0, 2, 3, 1)), False)
    _assert_close(y, ref, atol=5e-4)


def test_decoder32_parity():
    net = randomize(t_decoder32(), seed=2).eval()
    z = np.random.default_rng(2).normal(size=(2, 128)).astype(np.float32)
    ref = net(torch.from_numpy(z)).detach().numpy()

    variables, sign_map = NET_CONVERTERS["Decoder32"](np_sd(net))
    from iprgan_tpu.networks.vae_nets import Decoder32

    y = Decoder32().apply(variables, z, train=False)
    _assert_close(nchw(np.asarray(y)), ref)
    assert sign_map == {"3": "norm0_bn_scale", "6": "norm1_bn_scale"}


def test_encoder32_parity():
    net = randomize(TEncoder32(), seed=3).eval()
    x = np.random.default_rng(3).normal(size=(2, 3, 32, 32)).astype(np.float32)
    mean_ref, logvar_ref = (t.detach().numpy()
                            for t in net(torch.from_numpy(x)))

    variables, _ = NET_CONVERTERS["Encoder32"](np_sd(net))
    from iprgan_tpu.networks.vae_nets import Encoder32
    import jax

    _, (mean, logvar) = Encoder32().apply(
        variables, np.transpose(x, (0, 2, 3, 1)), train=False,
        rngs={"reparam": jax.random.PRNGKey(0)})
    _assert_close(mean, mean_ref)
    _assert_close(logvar, logvar_ref)


def test_sr_resnet_parity():
    net = randomize(t_sr_resnet(n_block=2), seed=4).eval()
    x = np.random.default_rng(4).uniform(size=(1, 3, 8, 8)).astype(np.float32)
    ref = net(torch.from_numpy(x)).detach().numpy()

    variables, sign_map = NET_CONVERTERS["SRResNet"](np_sd(net))
    from iprgan_tpu.networks.sr_resnet import SRResNet

    y = SRResNet(n_block=2).apply(
        variables, np.transpose(x, (0, 2, 3, 1)), train=False)
    _assert_close(nchw(np.asarray(y)), ref, atol=5e-4)
    assert sign_map["1.block.2.1"] == "body_norm_bn_scale"


def test_discriminator96_parity():
    net = randomize(t_discriminator96(), seed=5).eval()
    x = np.random.default_rng(5).uniform(size=(1, 3, 96, 96)).astype(np.float32)
    ref = net(torch.from_numpy(x)).detach().numpy()

    variables, _ = NET_CONVERTERS["Discriminator96"](np_sd(net))
    from iprgan_tpu.networks.sr_resnet import Discriminator96

    y = Discriminator96().apply(
        variables, np.transpose(x, (0, 2, 3, 1)), train=False)
    _assert_close(y, ref, atol=1e-3)


def test_resnet_generator_parity():
    net = randomize(t_resnet_generator(n_block=2), seed=6).eval()
    x = np.random.default_rng(6).uniform(
        -1, 1, size=(1, 3, 64, 64)).astype(np.float32)
    ref = net(torch.from_numpy(x)).detach().numpy()

    variables, sign_map = NET_CONVERTERS["Resnet9Blocks"](np_sd(net))
    from iprgan_tpu.networks.resnet_generator import ResnetGenerator

    y = ResnetGenerator(n_block=2).apply(
        variables, np.transpose(x, (0, 2, 3, 1)))
    _assert_close(nchw(np.asarray(y)), ref, atol=5e-4)
    # document-order head IN maps to head_norm, not to the first sorted key
    assert sign_map["2"] == "head_norm_scale"
    assert sign_map["13"] == "up0_norm_scale"


def test_conv_discriminator_parity():
    net = randomize(t_conv_discriminator(), seed=7).eval()
    x = np.random.default_rng(7).uniform(
        -1, 1, size=(1, 3, 64, 64)).astype(np.float32)
    ref = net(torch.from_numpy(x)).detach().numpy()

    variables, _ = NET_CONVERTERS["ConvDiscriminator"](np_sd(net))
    from iprgan_tpu.networks.resnet_generator import ConvDiscriminator

    y = ConvDiscriminator().apply(variables, np.transpose(x, (0, 2, 3, 1)))
    _assert_close(nchw(np.asarray(y)), ref, atol=1e-3)


# ---------------------------------------------------------------------------
# non-network state
# ---------------------------------------------------------------------------

def test_transform_buffers():
    rng = np.random.default_rng(8)
    fg = rng.uniform(size=(1, 3, 16, 16)).astype(np.float32)
    bg = np.zeros((1, 1, 16, 16), np.float32)
    out = convert_transform_buffers({"module.fg": fg, "module.bg": bg})
    assert out["fg"].shape == (16, 16, 3)
    assert out["bg"].shape == (16, 16, 1)
    np.testing.assert_array_equal(out["fg"], fg[0].transpose(1, 2, 0))

    mask = np.array([[5, 1, 9]], np.int64)
    out = convert_transform_buffers({"module._mask": mask})
    np.testing.assert_array_equal(out["_mask"], [5, 1, 9])
    assert out["_mask"].dtype == np.int32

    w = rng.uniform(1, 3, size=(1, 128)).astype(np.float32)
    a = (rng.uniform(size=(1, 128)) < 0.25).astype(np.float32)
    out = convert_transform_buffers({"module.w": w, "module.a": a})
    np.testing.assert_array_equal(out["w"], w)
    np.testing.assert_array_equal(out["a"], a)

    assert convert_transform_buffers({}) == {}


def test_pool_conversion():
    rng = np.random.default_rng(9)
    imgs = rng.uniform(size=(3, 3, 8, 8)).astype(np.float32)  # fill phase
    out = convert_pool({"images": imgs, "counts": np.float32(3.0)},
                       pool_size=5, image_size=8)
    assert out["images"].shape == (5, 8, 8, 3)
    np.testing.assert_array_equal(out["images"][:3],
                                  imgs.transpose(0, 2, 3, 1))
    np.testing.assert_array_equal(out["images"][3:], 0)
    assert out["counts"] == 3


def _embed_reference_signs(net, prefix="module"):
    """Reference-style sign embedding (tools/sign_model.py:33-40) over a
    DataParallel-like ``module.``-prefixed view: flip norm scales to
    |w|*sign in named_modules document order."""
    g = torch.Generator().manual_seed(42)
    sign_sd = {}
    for name, m in net.named_modules():
        if isinstance(m, (tnn.BatchNorm2d, tnn.InstanceNorm2d)) \
                and m.weight is not None:
            sign = (torch.randint(0, 2, (m.weight.shape[0],),
                                  generator=g).float() * 2 - 1)
            with torch.no_grad():
                m.weight.copy_(m.weight.abs() * sign)
            sign_sd[f"{prefix}_{name.replace('.', '_')}"] = sign.numpy()
    return sign_sd


@pytest.mark.parametrize("family", ["dcgan", "cyclegan"])
def test_sign_conversion_ber_zero(family):
    """Converted (params, sign) pairs must give BER == 0 — this fails if
    the converter mapped sign vectors by position instead of by layer
    (reference document order != this framework's sorted-path order for
    ResnetGenerator: head IN precedes the downs there)."""
    if family == "dcgan":
        net = randomize(TConvGenerator(mg=4))
        variables_fn = NET_CONVERTERS["ConvGenerator32"]
    else:
        net = randomize(t_resnet_generator(n_block=2), seed=11)
        variables_fn = NET_CONVERTERS["Resnet9Blocks"]
    sign_sd = _embed_reference_signs(net)
    variables, sign_map = variables_fn(np_sd(net))
    signs = convert_sign(sign_sd, sign_map)
    assert set(signs) == set(sign_map.values())
    ber = float(compute_ber(variables["params"], signs))
    assert ber == 0.0


# ---------------------------------------------------------------------------
# full-checkpoint integration (DCGAN complete)
# ---------------------------------------------------------------------------

def _dcgan_config(tmp_path):
    from PIL import Image

    wm_img = np.zeros((16, 16, 4), np.uint8)
    wm_img[2:14, 2:14] = [0, 128, 255, 255]
    wm = str(tmp_path / "wm.png")
    Image.fromarray(wm_img).save(wm)
    return Config({
        "dataset": {"name": "synthetic", "path": "", "size": 32},
        "experiment": "ImageGeneration",
        "evaluation": {"p_thres": 0.01,
                       "data": [{"bsz": 10, "name": "synthetic",
                                 "path": "", "size": 32}]},
        "model": {"type": "DCGAN", "G": "ConvGenerator32",
                  "D": "SNDiscriminator32", "opt": "Adam",
                  "opt_param": {"lr": 2e-4, "betas": [0.5, 0.999]}},
        "hparam": {"bsz": 8, "iteration": 4},
        "log": {"freq": 2, "path": str(tmp_path)},
        "protection": {
            "bbox": {"fn_inp": {"type": "TransformDist"},
                     "fn_out": {"type": "PasteWatermark", "size": 16,
                                "opaque": True, "watermark": wm},
                     "lambda": 1.0, "loss_fn": "ssim"},
            "wbox": {"gamma_0": 0.1, "string": "TEST SIG"}},
        "resource": {"gpu": False, "ngpu": 1, "worker": 0},
        "seed": 7,
    })


def test_full_checkpoint_roundtrip(tmp_path):
    """Convert a complete reference-layout DCGAN checkpoint and verify
    (a) the state-dict structure strict-matches the model's own, (b) a
    generate() through the converted state equals the torch forward,
    (c) signs verify with BER 0, (d) step and trigger buffers survive."""
    from flax import serialization, traverse_util
    import jax

    g_net = randomize(TConvGenerator(mg=4), seed=20)
    sign_sd = _embed_reference_signs(g_net)
    g_net.eval()
    d_net = randomize(TSNDiscriminator(md=4), seed=21)
    d_net.train()
    d_net(torch.zeros(2, 3, 32, 32))
    d_net.eval()

    rng = np.random.default_rng(22)
    fg = rng.uniform(size=(1, 3, 16, 16)).astype(np.float32)
    torch_ckpt = {
        "G": {f"module.{k}": v for k, v in np_sd(g_net).items()},
        "D": {f"module.{k}": v for k, v in np_sd(d_net).items()},
        "optG": {"state": {}},  # re-initialized, must not crash
        "optD": {"state": {}},
        "fn_inp": {},
        "fn_out": {"module.fg": fg,
                   "module.bg": np.zeros((1, 1, 16, 16), np.float32)},
        "sign": sign_sd,
        "step": 1234,
    }

    config = _dcgan_config(tmp_path)
    sd = convert(config, torch_ckpt)

    # (a) structure matches the model's own state dict, key for key
    from scripts.convert_reference_checkpoint import build_model

    model = build_model(config)
    template = serialization.to_state_dict(
        jax.device_get(model.init_state(jax.random.PRNGKey(config.seed))))
    for key in ("G", "D", "optG", "optD", "fn_inp", "fn_out", "sign"):
        t = traverse_util.flatten_dict(template[key], sep="/")
        c = traverse_util.flatten_dict(sd[key], sep="/")
        assert set(t) == set(c), f"{key}: {set(t) ^ set(c)}"
        for p in t:
            assert np.shape(t[p]) == np.shape(c[p]), (key, p)

    # (b) forward parity through the converted state
    z = np.random.default_rng(23).normal(size=(2, 128)).astype(np.float32)
    ref = g_net(torch.from_numpy(z)).detach().numpy()
    gvars = serialization.from_state_dict(template["G"], sd["G"])
    y = model.generate({"G": gvars}, z)
    np.testing.assert_allclose(nchw(np.asarray(y)), ref, atol=2e-4, rtol=1e-3)

    # (c) white-box verification on the converted weights
    assert float(compute_ber(sd["G"]["params"], sd["sign"])) == 0.0

    # (d) bookkeeping
    assert sd["step"] == 1234
    np.testing.assert_array_equal(sd["fn_out"]["fg"],
                                  fg[0].transpose(1, 2, 0))

    # 'END' sentinel passes through
    torch_ckpt["step"] = "END"
    assert convert(config, torch_ckpt)["step"] == "END"
