"""Minimal Caffe ``.caffemodel`` (NetParameter protobuf) reader.

The reference's external Cityscapes scorer loads
``caffemodel/fcn-8s-cityscapes.caffemodel`` through the Caffe runtime
(reference scripts/run.py:16-20). A caffemodel is a self-describing
protobuf; this module decodes the wire format directly — no caffe, no
compiled schema — extracting each layer's name, type, and weight blobs
as numpy arrays. Both serialization generations are handled:

* new-style ``NetParameter.layer``   (field 100, LayerParameter);
* old-style ``NetParameter.layers``  (field 2, V1LayerParameter) —
  the 2015-era FCN releases use this one.

Field numbers come from caffe.proto (BVLC caffe, public):
  NetParameter:       layer = 100, layers = 2
  LayerParameter:     name = 1 (string), type = 2 (string), blobs = 7
  V1LayerParameter:   name = 4 (string), type = 5 (enum),   blobs = 6
  BlobProto:          num/channels/height/width = 1..4 (legacy dims),
                      data = 5 (repeated float), shape = 7 (BlobShape),
                      double_data = 8 (repeated double)
  BlobShape:          dim = 1 (repeated int64)
"""

from __future__ import annotations

import numpy as np

# V1LayerParameter.LayerType values this reader needs to name
_V1_TYPES = {
    4: "Convolution",
    39: "Deconvolution",
    14: "InnerProduct",
    17: "Pooling",
    18: "ReLU",
    6: "Dropout",
}


def _varint(buf: memoryview, i: int) -> tuple[int, int]:
    shift = val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over a message buffer.
    LEN fields yield memoryviews; varints ints; fixed32/64 raw bytes."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, i = _varint(buf, i)
        elif wire == 2:
            ln, i = _varint(buf, i)
            val = buf[i:i + ln]
            i += ln
        elif wire == 5:
            val = buf[i:i + 4]
            i += 4
        elif wire == 1:
            val = buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wire} "
                             f"(field {field}, offset {i})")
        yield field, wire, val


def _parse_blob(buf: memoryview) -> np.ndarray:
    legacy = {}
    dims: list[int] = []
    data_chunks: list[np.ndarray] = []
    dtype = np.float32
    for field, wire, val in _fields(buf):
        if field in (1, 2, 3, 4) and wire == 0:
            legacy[field] = val
        elif field == 7 and wire == 2:  # BlobShape
            for f2, w2, v2 in _fields(val):
                if f2 != 1:
                    continue
                if w2 == 2:  # packed int64 dims
                    j = 0
                    while j < len(v2):
                        d, j = _varint(v2, j)
                        dims.append(d)
                else:  # unpacked
                    dims.append(v2)
        elif field == 5:  # float data
            if wire == 2:  # packed
                data_chunks.append(np.frombuffer(val, "<f4"))
            else:  # unpacked fixed32
                data_chunks.append(np.frombuffer(val, "<f4"))
        elif field == 8:  # double data
            dtype = np.float64
            if wire == 2:
                data_chunks.append(np.frombuffer(val, "<f8"))
            else:
                data_chunks.append(np.frombuffer(val, "<f8"))
    data = (np.concatenate(data_chunks) if data_chunks
            else np.empty(0, dtype))
    if not dims and legacy:
        dims = [legacy.get(k, 1) for k in (1, 2, 3, 4)]
    if dims:
        data = data.reshape(dims)
    return np.ascontiguousarray(data, dtype)


def _parse_layer(buf: memoryview, v1: bool) -> tuple[str, str, list]:
    name_f, type_f, blobs_f = (4, 5, 6) if v1 else (1, 2, 7)
    name = ltype = ""
    blobs = []
    for field, wire, val in _fields(buf):
        if field == name_f and wire == 2:
            name = bytes(val).decode("utf-8", "replace")
        elif field == type_f:
            if v1:
                ltype = _V1_TYPES.get(val, str(val))
            elif wire == 2:
                ltype = bytes(val).decode("utf-8", "replace")
        elif field == blobs_f and wire == 2:
            blobs.append(_parse_blob(val))
    return name, ltype, blobs


def read_caffemodel(path: str) -> dict:
    """Parse a .caffemodel into ``{layer_name: {"type": str,
    "blobs": [np.ndarray, ...]}}`` in network order (dict is ordered).
    Only layer entries are decoded; all other NetParameter fields are
    skipped structurally."""
    with open(path, "rb") as f:
        raw = memoryview(f.read())
    layers: dict = {}
    for field, wire, val in _fields(raw):
        if wire != 2 or field not in (2, 100):
            continue
        name, ltype, blobs = _parse_layer(val, v1=(field == 2))
        if name:
            layers[name] = {"type": ltype, "blobs": blobs}
    return layers


def write_caffemodel(path: str, layers: dict, v1: bool = False) -> None:
    """Inverse of :func:`read_caffemodel` (testing + fixture tooling):
    serializes ``{name: {"type": ..., "blobs": [...]}}`` as a
    NetParameter. ``type`` must be the string name; for v1 it is mapped
    back onto the V1 enum."""
    import struct

    def varint(v: int) -> bytes:
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            if v:
                out += bytes([b7 | 0x80])
            else:
                return out + bytes([b7])

    def tag(field: int, wire: int) -> bytes:
        return varint((field << 3) | wire)

    def ld(field: int, payload: bytes) -> bytes:
        return tag(field, 2) + varint(len(payload)) + payload

    rev_v1 = {v: k for k, v in _V1_TYPES.items()}
    out = b""
    for name, layer in layers.items():
        body = b""
        if v1:
            body += ld(4, name.encode())
            body += tag(5, 0) + varint(rev_v1[layer["type"]])
        else:
            body += ld(1, name.encode())
            body += ld(2, layer["type"].encode())
        for blob in layer.get("blobs", []):
            arr = np.asarray(blob, np.float32)
            shape = b"".join(tag(1, 0) + varint(d) for d in arr.shape)
            blob_body = ld(7, shape)
            blob_body += ld(5, struct.pack(f"<{arr.size}f",
                                           *arr.reshape(-1)))
            body += ld(6 if v1 else 7, blob_body)
        out += ld(2 if v1 else 100, body)
    with open(path, "wb") as f:
        f.write(out)


# -- FCN-8s-Cityscapes mapping ---------------------------------------------

# reference scripts/caffemodel/deploy.prototxt names its finetuned fc
# layers fc6_cs/fc7_cs; the flax module (scripts/run_fcn.build_fcn8s)
# uses the canonical FCN names
_FCN_ALIASES = {"fc6_cs": "fc6", "fc7_cs": "fc7"}


def fcn8s_variables(path: str) -> dict:
    """.caffemodel -> flax variables for scripts/run_fcn.build_fcn8s.

    Caffe Convolution weights are (out, in, kh, kw) — identical to torch
    Conv2d; Deconvolution weights are (in, out, kh, kw) computing the
    conv gradient — identical to torch ConvTranspose2d. Both therefore
    reuse the numerically-pinned torch->flax primitives."""
    from iprgan_tpu.utils.torch_convert import conv_w, convt_w

    params = {}
    for name, layer in read_caffemodel(path).items():
        blobs = layer["blobs"]
        if not blobs:
            continue
        w = blobs[0]
        if w.ndim != 4:
            raise ValueError(
                f"layer {name}: expected a 4-D weight blob, got "
                f"shape {w.shape} (InnerProduct layers are not part of "
                "the fully-convolutional FCN-8s)")
        kernel = (convt_w(w) if layer["type"] == "Deconvolution"
                  else conv_w(w))
        entry = {"kernel": kernel.astype(np.float32)}
        if len(blobs) > 1:
            entry["bias"] = np.asarray(blobs[1], np.float32).reshape(-1)
        params[_FCN_ALIASES.get(name, name)] = entry
    return {"params": params}
