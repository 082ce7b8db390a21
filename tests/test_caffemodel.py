"""Caffe .caffemodel wire-format reader (iprgan_tpu/utils/caffemodel.py).

Pure numpy — no jax, fast tier. The reader replaces the reference's
Caffe-runtime load of fcn-8s-cityscapes.caffemodel (reference
scripts/run.py:16-20); these tests fabricate caffemodel bytes (via the
module's writer AND by hand-encoding the wire format independently) and
check decoding across both serialization generations plus the legacy
blob-dim encoding.
"""
import struct

import numpy as np
import pytest

from iprgan_tpu.utils.caffemodel import (
    fcn8s_variables,
    read_caffemodel,
    write_caffemodel,
)


def _varint(v):
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def _tag(field, wire):
    return _varint((field << 3) | wire)


def _ld(field, payload):
    return _tag(field, 2) + _varint(len(payload)) + payload


@pytest.fixture
def layers(rng):
    return {
        "conv1_1": {"type": "Convolution",
                    "blobs": [rng.normal(size=(4, 3, 3, 3)).astype("f4"),
                              rng.normal(size=(4,)).astype("f4")]},
        "upscore2": {"type": "Deconvolution",
                     "blobs": [rng.normal(size=(4, 4, 4, 4)).astype("f4")]},
        "relu1": {"type": "ReLU", "blobs": []},
    }


@pytest.mark.parametrize("v1", [False, True])
def test_roundtrip(tmp_path, layers, v1):
    path = str(tmp_path / "net.caffemodel")
    write_caffemodel(path, layers, v1=v1)
    out = read_caffemodel(path)
    assert list(out) == ["conv1_1", "upscore2", "relu1"]
    for name in layers:
        assert out[name]["type"] == layers[name]["type"]
        assert len(out[name]["blobs"]) == len(layers[name]["blobs"])
        for a, b in zip(out[name]["blobs"], layers[name]["blobs"]):
            np.testing.assert_array_equal(a, b)


def test_legacy_blob_dims_hand_encoded(tmp_path):
    """2015-era blobs carry num/channels/height/width varints instead of
    a BlobShape — hand-encode one (independent of the module's writer)."""
    w = np.arange(2 * 3 * 1 * 1, dtype="f4").reshape(2, 3, 1, 1)
    blob = (_tag(1, 0) + _varint(2) + _tag(2, 0) + _varint(3)
            + _tag(3, 0) + _varint(1) + _tag(4, 0) + _varint(1)
            + _ld(5, struct.pack("<6f", *w.reshape(-1))))
    # V1LayerParameter: name=4, type=5 (enum 4 = CONVOLUTION), blobs=6
    layer = _ld(4, b"convX") + _tag(5, 0) + _varint(4) + _ld(6, blob)
    path = tmp_path / "legacy.caffemodel"
    path.write_bytes(_ld(2, layer))  # NetParameter.layers = 2
    out = read_caffemodel(str(path))
    assert out["convX"]["type"] == "Convolution"
    np.testing.assert_array_equal(out["convX"]["blobs"][0], w)


def test_unpacked_float_data(tmp_path):
    """repeated float may be serialized unpacked (one fixed32 per tag)."""
    vals = [1.5, -2.0, 3.25]
    shape = _ld(7, _tag(1, 0) + _varint(3))
    data = b"".join(_tag(5, 5) + struct.pack("<f", v) for v in vals)
    blob = shape + data
    layer = _ld(1, b"b") + _ld(2, b"Convolution") + _ld(7, blob)
    path = tmp_path / "unpacked.caffemodel"
    path.write_bytes(_ld(100, layer))
    out = read_caffemodel(str(path))
    np.testing.assert_allclose(out["b"]["blobs"][0],
                               np.asarray(vals, "f4"))


def test_fcn8s_variables_mapping(tmp_path, rng):
    """fc6_cs/fc7_cs aliases (reference deploy.prototxt names), conv
    (out,in,kh,kw)->flax (kh,kw,in,out), deconv (in,out,kh,kw) with the
    spatial flip, biases flattened, blob-free layers skipped."""
    cw = rng.normal(size=(5, 3, 3, 3)).astype("f4")
    cb = rng.normal(size=(5,)).astype("f4")
    fw = rng.normal(size=(7, 5, 7, 7)).astype("f4")
    fb = rng.normal(size=(1, 1, 1, 7)).astype("f4")  # legacy 4-D bias
    dw = rng.normal(size=(7, 7, 4, 4)).astype("f4")
    path = str(tmp_path / "fcn.caffemodel")
    write_caffemodel(path, {
        "conv1_1": {"type": "Convolution", "blobs": [cw, cb]},
        "relu1_1": {"type": "ReLU", "blobs": []},
        "fc6_cs": {"type": "Convolution", "blobs": [fw, fb]},
        "upscore2": {"type": "Deconvolution", "blobs": [dw]},
    }, v1=True)
    var = fcn8s_variables(path)
    p = var["params"]
    assert set(p) == {"conv1_1", "fc6", "upscore2"}
    np.testing.assert_array_equal(p["conv1_1"]["kernel"],
                                  cw.transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(p["conv1_1"]["bias"], cb)
    np.testing.assert_array_equal(p["fc6"]["kernel"],
                                  fw.transpose(2, 3, 1, 0))
    assert p["fc6"]["bias"].shape == (7,)
    np.testing.assert_array_equal(
        p["upscore2"]["kernel"],
        dw.transpose(2, 3, 0, 1)[::-1, ::-1])
    assert "bias" not in p["upscore2"]


def test_fcn8s_variables_rejects_dense(tmp_path, rng):
    path = str(tmp_path / "ip.caffemodel")
    write_caffemodel(path, {
        "fc6": {"type": "InnerProduct",
                "blobs": [rng.normal(size=(10, 20)).astype("f4")]},
    })
    with pytest.raises(ValueError, match="4-D weight blob"):
        fcn8s_variables(path)
