"""Corruption-robustness fuzz, modeled on the reference's
tests/corruption.rs: flip one random bit in the frame region x100 and assert
decode fails (CRC-8/CRC-16/MD5 layering catches it).
"""

import io

import numpy as np
import pytest

from flac_codec_tpu import metadata as meta
from flac_codec_tpu.decode import Verified, verify
from flac_codec_tpu.errors import FlacError


def test_random_bit_flips(ref_data):
    raw = bytearray((ref_data / "sine.flac").read_bytes())
    fp = io.BytesIO(bytes(raw))
    meta.read_blocks(fp)
    frames_start = fp.tell()

    rng = np.random.default_rng(0xF1AC)
    for _ in range(100):
        corrupt = bytearray(raw)
        bit = int(rng.integers(frames_start * 8, len(raw) * 8))
        corrupt[bit // 8] ^= 1 << (bit % 8)
        try:
            result = verify(io.BytesIO(bytes(corrupt)))
            assert result == Verified.MD5_MISMATCH, (
                f"bit flip at {bit} undetected")
        except FlacError:
            pass  # detected via CRC/parse failure — good
