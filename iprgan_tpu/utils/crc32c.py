"""CRC32-C (Castagnoli) with the TFRecord masking, pure Python.

TensorBoard event files are TFRecords framed with masked crc32c checksums.
We implement the checksum here rather than depending on the `crc32c`
wheel (the reference pulls it in transitively via tensorboard,
reference requirements.txt:1).
"""

from __future__ import annotations

_POLY = 0x82F63B78

_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ _POLY if _c & 1 else _c >> 1
    _TABLE.append(_c)


def crc32c(data: bytes, value: int = 0) -> int:
    crc = value ^ 0xFFFFFFFF
    for b in data:
        crc = _TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    """TFRecord mask: rotate right by 15 bits and add a constant."""
    crc = crc32c(data)
    return ((crc >> 15) | (crc << 17)) + 0xA282EAD8 & 0xFFFFFFFF
