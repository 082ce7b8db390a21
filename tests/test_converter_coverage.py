"""Full-key-coverage tests for the pretrained-weight converters.

This environment has no egress, so the real ``pt_inception-2015-12-05``
and torchvision ``vgg19`` checkpoints can never be loaded here. These
tests close the residual risk VERDICT r3 called out: a silent converter
key-mapping gap that only a real checkpoint would expose. They vendor
the published checkpoints' EXACT key inventories (every key, correct
shapes — torchvision inception_v3 with the pytorch-fid 1008-class fc,
and torchvision vgg19 features+classifier), fabricate a synthetic state
dict from them, convert, and assert the result is structurally
identical (same paths, same shapes) to the flax modules' own init trees
via jax.eval_shape — so no leaf can be silently defaulted and no
state-dict weight silently dropped.

Reference parity anchors: /root/reference/networks/inception.py:14
(pt_inception URL), /root/reference/networks/vgg.py:30-37 (torchvision
vgg19).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iprgan_tpu.networks.inception import (
    InceptionV3FID,
    convert_torch_state_dict,
)
from iprgan_tpu.networks.vgg import VGG19Feature, convert_vgg19_state_dict

# ---------------------------------------------------------------------------
# torchvision inception_v3 key inventory (shapes included). Spec format:
# module name -> list of (basic-conv name, in_ch, out_ch, (kh, kw)).
# ---------------------------------------------------------------------------


def _inception_a(cin, pool):
    return [("branch1x1", cin, 64, (1, 1)),
            ("branch5x5_1", cin, 48, (1, 1)),
            ("branch5x5_2", 48, 64, (5, 5)),
            ("branch3x3dbl_1", cin, 64, (1, 1)),
            ("branch3x3dbl_2", 64, 96, (3, 3)),
            ("branch3x3dbl_3", 96, 96, (3, 3)),
            ("branch_pool", cin, pool, (1, 1))]


def _inception_b(cin):
    return [("branch3x3", cin, 384, (3, 3)),
            ("branch3x3dbl_1", cin, 64, (1, 1)),
            ("branch3x3dbl_2", 64, 96, (3, 3)),
            ("branch3x3dbl_3", 96, 96, (3, 3))]


def _inception_c(c7):
    return [("branch1x1", 768, 192, (1, 1)),
            ("branch7x7_1", 768, c7, (1, 1)),
            ("branch7x7_2", c7, c7, (1, 7)),
            ("branch7x7_3", c7, 192, (7, 1)),
            ("branch7x7dbl_1", 768, c7, (1, 1)),
            ("branch7x7dbl_2", c7, c7, (7, 1)),
            ("branch7x7dbl_3", c7, c7, (1, 7)),
            ("branch7x7dbl_4", c7, c7, (7, 1)),
            ("branch7x7dbl_5", c7, 192, (1, 7)),
            ("branch_pool", 768, 192, (1, 1))]


def _inception_d():
    return [("branch3x3_1", 768, 192, (1, 1)),
            ("branch3x3_2", 192, 320, (3, 3)),
            ("branch7x7x3_1", 768, 192, (1, 1)),
            ("branch7x7x3_2", 192, 192, (1, 7)),
            ("branch7x7x3_3", 192, 192, (7, 1)),
            ("branch7x7x3_4", 192, 192, (3, 3))]


def _inception_e(cin):
    return [("branch1x1", cin, 320, (1, 1)),
            ("branch3x3_1", cin, 384, (1, 1)),
            ("branch3x3_2a", 384, 384, (1, 3)),
            ("branch3x3_2b", 384, 384, (3, 1)),
            ("branch3x3dbl_1", cin, 448, (1, 1)),
            ("branch3x3dbl_2", 448, 384, (3, 3)),
            ("branch3x3dbl_3a", 384, 384, (1, 3)),
            ("branch3x3dbl_3b", 384, 384, (3, 1)),
            ("branch_pool", cin, 192, (1, 1))]


INCEPTION_SPEC = {
    "": [("Conv2d_1a_3x3", 3, 32, (3, 3)),
         ("Conv2d_2a_3x3", 32, 32, (3, 3)),
         ("Conv2d_2b_3x3", 32, 64, (3, 3)),
         ("Conv2d_3b_1x1", 64, 80, (1, 1)),
         ("Conv2d_4a_3x3", 80, 192, (3, 3))],
    "Mixed_5b": _inception_a(192, 32),
    "Mixed_5c": _inception_a(256, 64),
    "Mixed_5d": _inception_a(288, 64),
    "Mixed_6a": _inception_b(288),
    "Mixed_6b": _inception_c(128),
    "Mixed_6c": _inception_c(160),
    "Mixed_6d": _inception_c(160),
    "Mixed_6e": _inception_c(192),
    "Mixed_7a": _inception_d(),
    "Mixed_7b": _inception_e(1280),
    "Mixed_7c": _inception_e(2048),
}


def make_inception_state_dict(with_bn_counters=True):
    """Every key of the pt_inception-2015-12-05 checkpoint, with exact
    shapes; deterministic tiny values (never materialize 100MB)."""
    sd = {}
    for module, convs in INCEPTION_SPEC.items():
        prefix = f"{module}." if module else ""
        for name, cin, cout, (kh, kw) in convs:
            base = f"{prefix}{name}"
            sd[f"{base}.conv.weight"] = np.full(
                (cout, cin, kh, kw), 0.01, np.float32)
            for leaf, fill in (("weight", 1.0), ("bias", 0.0),
                               ("running_mean", 0.0),
                               ("running_var", 1.0)):
                sd[f"{base}.bn.{leaf}"] = np.full((cout,), fill,
                                                  np.float32)
            if with_bn_counters:
                sd[f"{base}.bn.num_batches_tracked"] = np.asarray(
                    0, np.int64)
    sd["fc.weight"] = np.zeros((1008, 2048), np.float32)
    sd["fc.bias"] = np.zeros((1008,), np.float32)
    return sd


def _shape_leaves(tree, prefix=()):
    """Flatten a (possibly ShapeDtypeStruct) tree to {path: shape}."""
    out = {}
    for key, val in tree.items():
        if isinstance(val, dict):
            out.update(_shape_leaves(val, prefix + (key,)))
        else:
            out[prefix + (key,)] = tuple(val.shape)
    return out


@pytest.mark.parametrize("with_bn_counters", [True, False])
def test_inception_converter_full_key_coverage(with_bn_counters):
    sd = make_inception_state_dict(with_bn_counters)
    variables = convert_torch_state_dict(sd)
    expected = jax.eval_shape(
        InceptionV3FID().init, jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3), jnp.float32))
    got = {coll: _shape_leaves(tree) for coll, tree in variables.items()}
    want = {coll: _shape_leaves(dict(tree))
            for coll, tree in expected.items()}
    assert set(got) == set(want) == {"params", "batch_stats"}
    for coll in want:
        missing = set(want[coll]) - set(got[coll])
        extra = set(got[coll]) - set(want[coll])
        assert not missing, f"{coll}: default-initialized leaves {missing}"
        assert not extra, f"{coll}: unmapped converted leaves {extra}"
        for path in want[coll]:
            assert got[coll][path] == want[coll][path], (
                coll, path, got[coll][path], want[coll][path])


def test_inception_converter_rejects_unconsumed_keys():
    sd = make_inception_state_dict()
    sd["Mixed_5b.branch1x1.conv.weihgt"] = sd.pop(  # typo'd key
        "Mixed_5b.branch1x1.conv.weight")
    with pytest.raises(ValueError, match="did not consume"):
        convert_torch_state_dict(sd)


def test_inception_converter_tolerates_aux_head():
    sd = make_inception_state_dict()
    sd["AuxLogits.conv0.conv.weight"] = np.zeros((128, 768, 1, 1),
                                                 np.float32)
    convert_torch_state_dict(sd)  # ignored, not an error


# ---------------------------------------------------------------------------
# torchvision vgg19: features convs at fixed indices + classifier.
# ---------------------------------------------------------------------------

VGG19_CONV_IDS = (0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30,
                  32, 34)
VGG19_CHANNELS = (64, 64, 128, 128, 256, 256, 256, 256, 512, 512, 512,
                  512, 512, 512, 512, 512)


def make_vgg19_state_dict():
    sd = {}
    cin = 3
    for idx, cout in zip(VGG19_CONV_IDS, VGG19_CHANNELS):
        sd[f"features.{idx}.weight"] = np.full((cout, cin, 3, 3), 0.01,
                                               np.float32)
        sd[f"features.{idx}.bias"] = np.zeros((cout,), np.float32)
        cin = cout
    for idx, (i, o) in zip((0, 3, 6), ((25088, 4096), (4096, 4096),
                                       (4096, 1000))):
        sd[f"classifier.{idx}.weight"] = np.zeros((o, i), np.float32)
        sd[f"classifier.{idx}.bias"] = np.zeros((o,), np.float32)
    return sd


def test_vgg19_converter_full_key_coverage():
    variables = convert_vgg19_state_dict(make_vgg19_state_dict())
    expected = jax.eval_shape(
        VGG19Feature(layer="relu5_4").init, jax.random.PRNGKey(0),
        jnp.zeros((1, 96, 96, 3), jnp.float32))
    got = _shape_leaves(variables["params"])
    want = _shape_leaves(dict(expected["params"]))
    assert got.keys() == want.keys(), (
        set(want) ^ set(got))
    for path in want:
        assert got[path] == want[path], (path, got[path], want[path])


def test_vgg19_converter_rejects_missing_conv():
    sd = make_vgg19_state_dict()
    del sd["features.34.weight"], sd["features.34.bias"]
    with pytest.raises(ValueError, match="expected 16 conv layers"):
        convert_vgg19_state_dict(sd)


def test_vgg19_converter_rejects_unknown_features_key():
    sd = make_vgg19_state_dict()
    sd["features.1.running_mean"] = np.zeros((64,), np.float32)
    with pytest.raises(ValueError):
        convert_vgg19_state_dict(sd)
