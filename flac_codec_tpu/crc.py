"""Table-driven CRC-8 (poly 0x07) and CRC-16 (poly 0x8005) engines.

Behavioral parity with the reference CRC engine (reference: src/crc.rs:1-188):
both CRCs use initial value 0, no reflection, no final XOR, and a stream that
*includes* its trailing CRC bytes hashes to residue 0 (``valid()``).

The byte loop is host-side; when the optional native extension is available
(flac_codec_tpu.native) the per-buffer loop runs in C++, otherwise a Python
table loop is used.  Tables are generated programmatically, not copied.
"""

from __future__ import annotations

import numpy as np


def _make_table(poly: int, width: int) -> np.ndarray:
    """Generate a 256-entry CRC table for an MSB-first CRC of `width` bits."""
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        crc = i << (width - 8)
        for _ in range(8):
            if crc & top:
                crc = ((crc << 1) ^ poly) & mask
            else:
                crc = (crc << 1) & mask
        table[i] = crc
    return table


CRC8_TABLE = _make_table(0x07, 8).astype(np.uint8)
CRC16_TABLE = _make_table(0x8005, 16).astype(np.uint16)

_native = None


def _get_native():
    global _native
    if _native is None:
        try:
            from . import native

            _native = native.load() or False
        except Exception:
            _native = False
    return _native


def crc8(data: bytes | bytearray | memoryview, crc: int = 0) -> int:
    """CRC-8 of ``data``, continuing from ``crc``."""
    nat = _get_native()
    if nat:
        return nat.crc8(bytes(data), crc)
    table = CRC8_TABLE
    for b in data:
        crc = table[crc ^ b]
    return int(crc)


def crc16(data: bytes | bytearray | memoryview, crc: int = 0) -> int:
    """CRC-16 of ``data``, continuing from ``crc``."""
    nat = _get_native()
    if nat:
        return nat.crc16(bytes(data), crc)
    table = CRC16_TABLE
    for b in data:
        crc = int(table[(crc >> 8) ^ b]) ^ ((crc << 8) & 0xFFFF)
    return int(crc)


class Crc8:
    """Streaming CRC-8 accumulator (reference: src/crc.rs Crc8)."""

    __slots__ = ("value",)

    def __init__(self) -> None:
        self.value = 0

    def update(self, data: bytes) -> None:
        self.value = crc8(data, self.value)

    def valid(self) -> bool:
        return self.value == 0


class Crc16:
    """Streaming CRC-16 accumulator (reference: src/crc.rs Crc16)."""

    __slots__ = ("value",)

    def __init__(self) -> None:
        self.value = 0

    def update(self, data: bytes) -> None:
        self.value = crc16(data, self.value)

    def valid(self) -> bool:
        return self.value == 0
