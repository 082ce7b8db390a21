"""Minimal, dependency-free TensorBoard event writer + PNG image dumper.

Replaces the reference's `torch.utils.tensorboard.SummaryWriter` logging
layer (reference experiments/util.py:9-42) without pulling in
tensorboard. We hand-encode the two protobuf messages TensorBoard needs
(Event, Summary with scalar / image values) and frame them as TFRecords
with masked crc32c checksums; the resulting event files load in stock
TensorBoard.
"""

from __future__ import annotations

import io
import os
import socket
import struct
import time

import numpy as np

from iprgan_tpu.utils.crc32c import masked_crc32c


# ---------------------------------------------------------------------------
# tiny protobuf encoder (just what Event/Summary need)
# ---------------------------------------------------------------------------

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _pb_double(field: int, v: float) -> bytes:
    return _tag(field, 1) + struct.pack("<d", v)


def _pb_float(field: int, v: float) -> bytes:
    return _tag(field, 5) + struct.pack("<f", v)


def _pb_int(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(v)


def _pb_bytes(field: int, v: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(v)) + v


def _pb_str(field: int, v: str) -> bytes:
    return _pb_bytes(field, v.encode("utf-8"))


def _summary_scalar(tag: str, value: float) -> bytes:
    val = _pb_str(1, tag) + _pb_float(2, float(value))
    return _pb_bytes(1, val)  # Summary.value (repeated field 1)


def _summary_image(tag: str, png: bytes, h: int, w: int) -> bytes:
    img = _pb_int(1, h) + _pb_int(2, w) + _pb_int(3, 3) + _pb_bytes(4, png)
    val = _pb_str(1, tag) + _pb_bytes(4, img)  # Summary.Value.image = field 4
    return _pb_bytes(1, val)


def _event(step: int, summary: bytes | None = None,
           file_version: str | None = None) -> bytes:
    body = _pb_double(1, time.time()) + _pb_int(2, step)
    if file_version is not None:
        body += _pb_str(3, file_version)
    if summary is not None:
        body += _pb_bytes(5, summary)
    return body


# ---------------------------------------------------------------------------
# event file
# ---------------------------------------------------------------------------

class EventFileWriter:
    """Appends TFRecord-framed Event protos to an events file."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        fname = f"events.out.tfevents.{int(time.time())}.{socket.gethostname()}"
        self._path = os.path.join(logdir, fname)
        self._f = open(self._path, "ab")
        self._write_record(_event(0, file_version="brain.Event:2"))
        self.flush()

    def _write_record(self, data: bytes) -> None:
        header = struct.pack("<Q", len(data))
        self._f.write(header)
        self._f.write(struct.pack("<I", masked_crc32c(header)))
        self._f.write(data)
        self._f.write(struct.pack("<I", masked_crc32c(data)))

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self._write_record(_event(step, _summary_scalar(tag, value)))

    def add_image(self, tag: str, png: bytes, h: int, w: int, step: int) -> None:
        self._write_record(_event(step, _summary_image(tag, png, h, w)))

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        self._f.close()


# ---------------------------------------------------------------------------
# image helpers
# ---------------------------------------------------------------------------

def to_uint8(img: np.ndarray) -> np.ndarray:
    """[0,1] float HWC -> uint8, truncating like PIL's to_pil_image."""
    img = np.clip(np.asarray(img, dtype=np.float32), 0.0, 1.0)
    return (img * 255.0).astype(np.uint8)


def encode_png(img_hwc_uint8: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img_hwc_uint8).save(buf, format="PNG")
    return buf.getvalue()


def make_grid(images: np.ndarray, per_row: int = 8, pad: int = 2) -> np.ndarray:
    """Tile a batch [N,H,W,C] in [0,1] into one [gh,gw,C] grid image."""
    n, h, w, c = images.shape
    cols = min(per_row, n)
    rows = (n + cols - 1) // cols
    grid = np.zeros((rows * (h + pad) + pad, cols * (w + pad) + pad, c),
                    dtype=images.dtype)
    for i in range(n):
        r, col = divmod(i, cols)
        y = pad + r * (h + pad)
        x = pad + col * (w + pad)
        grid[y:y + h, x:x + w] = images[i]
    return grid


class Logger:
    """TensorBoard scalars + image grids + stdout banner.

    Mirrors the reference Logger surface (experiments/util.py:9-27):
    ``write_scalar(metrics_dict, step)`` and ``save_images(batch, step)``.
    Images are NHWC float in [0,1] here (TPU-native layout) rather than
    the reference's NCHW.
    """

    def __init__(self, config):
        self.directory = config.log.path
        os.makedirs(self.directory, exist_ok=True)
        self.writer = EventFileWriter(self.directory)
        print("*** LOG ***")
        print(f"Path: {self.directory}\n")

    def write_scalar(self, metrics: dict, index: int) -> None:
        for k, v in metrics.items():
            self.writer.add_scalar(k, float(v), index)

    def save_images(self, images: np.ndarray, index: int) -> None:
        grid = to_uint8(make_grid(np.asarray(images)))
        png = encode_png(grid)
        self.writer.add_image("sample", png, grid.shape[0], grid.shape[1], index)
        self.writer.flush()

    def flush(self) -> None:
        self.writer.flush()


class ImageWriter:
    """Counter-named PNG dumper (reference experiments/util.py:29-42).

    Takes NHWC or HWC float arrays in [0,1].
    """

    def __init__(self, directory: str):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)
        self.counter: dict[str, int] = {}

    def __call__(self, img: np.ndarray, prefix: str | None = None,
                 suffix: str | None = None) -> str:
        from PIL import Image

        prefix = prefix + "_" if prefix else ""
        suffix = "_" + suffix if suffix else ""
        key = prefix + suffix
        idx = self.counter.get(key, 0)
        hex_id = hex(idx)[2:].zfill(6)
        fpath = os.path.join(self.directory, f"{prefix}{hex_id}{suffix}.png")
        Image.fromarray(to_uint8(np.asarray(img))).save(fpath)
        self.counter[key] = idx + 1
        return fpath
