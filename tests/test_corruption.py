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


def test_crc16_footer_flip_raises_in_bulk_path():
    """A flipped CRC-16 footer must raise Crc16Mismatch through the bulk
    native decode path — not silently drop the frame (regression)."""
    import io

    import numpy as np

    from flac_codec_tpu.decode import FlacSampleReader
    from flac_codec_tpu.encode import FlacSampleWriter, Options
    from flac_codec_tpu.errors import Crc16Mismatch
    from flac_codec_tpu.format.analyze import FrameIterator

    rng = np.random.default_rng(0)
    n = 1024 * 4
    inter = rng.integers(-3000, 3000, 2 * n).astype(np.int32)
    buf = io.BytesIO()
    w = FlacSampleWriter(buf, Options(block_size=1024).no_seektable(),
                         44100, 16, 2, total_samples=n)
    w.write(inter)
    w.finalize()
    data = bytearray(buf.getvalue())

    # find the second frame's offset; its CRC-16 footer is the two bytes
    # before the third frame's offset
    offsets = [off for _, off in FrameIterator(io.BytesIO(bytes(data)))]
    assert len(offsets) >= 3
    data[offsets[2] - 1] ^= 0x01  # low byte of frame 1's CRC-16

    r = FlacSampleReader(io.BytesIO(bytes(data)))
    try:
        out = r.read_all()
        raise AssertionError(
            f"decoded {len(out)} samples from a CRC-corrupt stream")
    except Crc16Mismatch:
        pass


def test_options_tag_does_not_mutate_parent():
    from flac_codec_tpu import metadata as meta
    from flac_codec_tpu.encode import Options

    base = Options().tag("ARTIST", "X")
    a = base.tag("TITLE", "A")
    b = base.tag("TITLE", "B")

    def titles(o):
        vc = next(bl for bl in o.metadata_blocks
                  if isinstance(bl, meta.VorbisComment))
        return vc.all("TITLE")

    assert titles(a) == ["A"]
    assert titles(b) == ["B"]
    assert titles(base) == []
