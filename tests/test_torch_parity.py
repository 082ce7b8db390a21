"""Numerical parity of the flax FID-InceptionV3 and VGG19 stacks vs a
torch forward (VERDICT round-1 'missing #3').

The environment has no torchvision and no network egress, so the torch
side is built here from scratch, state-dict compatible with the
checkpoints the converters target:

* ``TorchInceptionFID`` mirrors the pytorch-fid / torchvision
  InceptionV3 key layout (``Mixed_5b.branch1x1.conv.weight`` ...)
  including the FID patches the reference relies on
  (reference networks/inception.py:183-324): count_include_pad=False
  avg pools in A/C/E blocks, max pool in the last E block, 1008-way fc.
* ``torch_vgg19_features`` mirrors torchvision ``vgg19().features``
  numbering (``features.{0,2,5,...}.weight``), which the reference
  truncates at relu5_4 (reference networks/vgg.py:30-37).

Each test renders the SAME random checkpoint through torch and through
``convert_torch_state_dict`` / ``load_vgg19_features`` + flax, and
asserts the activations agree — so any converter-mapping or
architecture drift fails here numerically, not just structurally.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402


# ---------------------------------------------------------------------------
# torch-side FID InceptionV3 (from scratch; pytorch-fid key layout)
# ---------------------------------------------------------------------------

class TBasic(tnn.Module):
    def __init__(self, cin, cout, k, stride=1, padding=0):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride, padding, bias=False)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return tF.relu(self.bn(self.conv(x)))


def _avg3(x):
    return tF.avg_pool2d(x, 3, 1, 1, count_include_pad=False)


class TInceptionA(tnn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = TBasic(cin, 64, 1)
        self.branch5x5_1 = TBasic(cin, 48, 1)
        self.branch5x5_2 = TBasic(48, 64, 5, padding=2)
        self.branch3x3dbl_1 = TBasic(cin, 64, 1)
        self.branch3x3dbl_2 = TBasic(64, 96, 3, padding=1)
        self.branch3x3dbl_3 = TBasic(96, 96, 3, padding=1)
        self.branch_pool = TBasic(cin, pool_features, 1)

    def forward(self, x):
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([self.branch1x1(x), b5, bd,
                          self.branch_pool(_avg3(x))], 1)


class TInceptionB(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = TBasic(cin, 384, 3, stride=2)
        self.branch3x3dbl_1 = TBasic(cin, 64, 1)
        self.branch3x3dbl_2 = TBasic(64, 96, 3, padding=1)
        self.branch3x3dbl_3 = TBasic(96, 96, 3, stride=2)

    def forward(self, x):
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([self.branch3x3(x), bd, tF.max_pool2d(x, 3, 2)], 1)


class TInceptionC(tnn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = TBasic(cin, 192, 1)
        self.branch7x7_1 = TBasic(cin, c7, 1)
        self.branch7x7_2 = TBasic(c7, c7, (1, 7), padding=(0, 3))
        self.branch7x7_3 = TBasic(c7, 192, (7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TBasic(cin, c7, 1)
        self.branch7x7dbl_2 = TBasic(c7, c7, (7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = TBasic(c7, c7, (1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = TBasic(c7, c7, (7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = TBasic(c7, 192, (1, 7), padding=(0, 3))
        self.branch_pool = TBasic(cin, 192, 1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        for m in (self.branch7x7dbl_2, self.branch7x7dbl_3,
                  self.branch7x7dbl_4, self.branch7x7dbl_5):
            bd = m(bd)
        return torch.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(_avg3(x))], 1)


class TInceptionD(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = TBasic(cin, 192, 1)
        self.branch3x3_2 = TBasic(192, 320, 3, stride=2)
        self.branch7x7x3_1 = TBasic(cin, 192, 1)
        self.branch7x7x3_2 = TBasic(192, 192, (1, 7), padding=(0, 3))
        self.branch7x7x3_3 = TBasic(192, 192, (7, 1), padding=(3, 0))
        self.branch7x7x3_4 = TBasic(192, 192, 3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_1(x)
        for m in (self.branch7x7x3_2, self.branch7x7x3_3,
                  self.branch7x7x3_4):
            b7 = m(b7)
        return torch.cat([b3, b7, tF.max_pool2d(x, 3, 2)], 1)


class TInceptionE(tnn.Module):
    def __init__(self, cin, pool):
        super().__init__()
        self.pool = pool  # 'avg' (Mixed_7b) / 'max' (Mixed_7c FID patch)
        self.branch1x1 = TBasic(cin, 320, 1)
        self.branch3x3_1 = TBasic(cin, 384, 1)
        self.branch3x3_2a = TBasic(384, 384, (1, 3), padding=(0, 1))
        self.branch3x3_2b = TBasic(384, 384, (3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = TBasic(cin, 448, 1)
        self.branch3x3dbl_2 = TBasic(448, 384, 3, padding=1)
        self.branch3x3dbl_3a = TBasic(384, 384, (1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = TBasic(384, 384, (3, 1), padding=(1, 0))
        self.branch_pool = TBasic(cin, 192, 1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = (tF.max_pool2d(x, 3, 1, 1) if self.pool == "max" else _avg3(x))
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(bp)], 1)


class TorchInceptionFID(tnn.Module):
    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasic(3, 32, 3, stride=2)
        self.Conv2d_2a_3x3 = TBasic(32, 32, 3)
        self.Conv2d_2b_3x3 = TBasic(32, 64, 3, padding=1)
        self.Conv2d_3b_1x1 = TBasic(64, 80, 1)
        self.Conv2d_4a_3x3 = TBasic(80, 192, 3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.Mixed_5c = TInceptionA(256, 64)
        self.Mixed_5d = TInceptionA(288, 64)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128)
        self.Mixed_6c = TInceptionC(768, 160)
        self.Mixed_6d = TInceptionC(768, 160)
        self.Mixed_6e = TInceptionC(768, 192)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280, "avg")
        self.Mixed_7c = TInceptionE(2048, "max")
        self.fc = tnn.Linear(2048, 1008)

    def forward(self, x):  # x: NCHW 299x299 in [-1, 1]
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = tF.max_pool2d(x, 3, 2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = tF.max_pool2d(x, 3, 2)
        for name in ("5b", "5c", "5d", "6a", "6b", "6c", "6d", "6e",
                     "7a", "7b", "7c"):
            x = getattr(self, f"Mixed_{name}")(x)
        feats = x.mean((2, 3))
        return feats, self.fc(feats)


def _randomize_bn(net, gen):
    """Give BN layers non-trivial running stats so parity actually
    exercises the mean/var/scale/bias mapping."""
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.randn(m.num_features, generator=gen) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.num_features, generator=gen) + 0.5)
                m.weight.copy_(
                    torch.rand(m.num_features, generator=gen) + 0.5)
                m.bias.copy_(
                    torch.randn(m.num_features, generator=gen) * 0.1)


def test_inception_forward_matches_torch():
    import jax
    import jax.numpy as jnp

    from iprgan_tpu.networks.inception import (InceptionV3FID,
                                               convert_torch_state_dict)

    gen = torch.Generator().manual_seed(0)
    net = TorchInceptionFID().eval()
    _randomize_bn(net, gen)

    # 299px input -> the flax module's internal resize is the identity,
    # isolating the conv/bn/pool architecture from resize semantics
    # (resize itself is covered by test_resize_matches_torch_interpolate).
    x_t = torch.rand(1, 3, 299, 299, generator=gen) * 2 - 1
    with torch.no_grad():
        feats_t, logits_t = net(x_t)

    variables = convert_torch_state_dict(
        {k: v.numpy() for k, v in net.state_dict().items()})
    x_j = jnp.asarray(x_t.permute(0, 2, 3, 1).numpy())
    feats_j, logits_j = jax.jit(InceptionV3FID().apply)(variables, x_j)

    # ~100 chained f32 convs: compare with a scale-aware tolerance.
    np.testing.assert_allclose(np.asarray(feats_j), feats_t.numpy(),
                               rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t.numpy(),
                               rtol=1e-3, atol=5e-3)


def test_resize_matches_torch_interpolate():
    """The FID preprocessing upsample (32 -> 299, bilinear) matches
    torch F.interpolate(align_corners=False) — both use half-pixel
    centers, so the full eval input path is torch-equivalent."""
    import jax
    import jax.numpy as jnp

    x = np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3)) \
        .astype(np.float32)
    out_j = jax.image.resize(jnp.asarray(x), (2, 299, 299, 3), "bilinear")
    out_t = tF.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                           size=(299, 299), mode="bilinear",
                           align_corners=False)
    np.testing.assert_allclose(np.asarray(out_j),
                               out_t.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# torch-side VGG19 features (torchvision numbering)
# ---------------------------------------------------------------------------

_VGG19_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M")


class TorchVGG19(tnn.Module):
    def __init__(self):
        super().__init__()
        layers, cin = [], 3
        for c in _VGG19_CFG:
            if c == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers += [tnn.Conv2d(cin, c, 3, padding=1),
                           tnn.ReLU(inplace=True)]
                cin = c
        self.features = tnn.Sequential(*layers)


def test_vgg19_forward_matches_torch(tmp_path):
    import jax
    import jax.numpy as jnp

    from iprgan_tpu.networks.vgg import VGG19Feature, load_vgg19_features

    torch.manual_seed(1)
    net = TorchVGG19().eval()
    pth = tmp_path / "vgg19.pth"
    torch.save(net.state_dict(), pth)

    x_t = torch.rand(1, 3, 64, 64) * 2 - 1
    with torch.no_grad():
        # relu5_4 = everything up to (not including) the final maxpool
        feat_t = net.features[:-1](x_t)

    flax_net = VGG19Feature(layer="relu5_4")
    variables = load_vgg19_features(str(pth), flax_net)
    feat_j = jax.jit(flax_net.apply)(
        jax.tree_util.tree_map(jnp.asarray, variables),
        jnp.asarray(x_t.permute(0, 2, 3, 1).numpy()))

    np.testing.assert_allclose(np.asarray(feat_j),
                               feat_t.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-4)
