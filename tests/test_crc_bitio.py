"""Support-layer tests: CRC engines and the bit I/O engine."""

import numpy as np
import pytest

from flac_codec_tpu import crc
from flac_codec_tpu.bitio import BitReader, BitWriter
from flac_codec_tpu.errors import EndOfStream


# -- CRC --------------------------------------------------------------------

def test_crc8_known_vectors():
    # "123456789" check value for CRC-8/SMBUS (poly 0x07, init 0) is 0xF4
    assert crc.crc8(b"123456789") == 0xF4
    assert crc.crc8(b"") == 0
    assert crc.crc8(b"\x00") == 0


def test_crc16_known_vectors():
    # "123456789" check value for CRC-16/BUYPASS (poly 0x8005, init 0,
    # no reflection) is 0xFEE8
    assert crc.crc16(b"123456789") == 0xFEE8
    assert crc.crc16(b"") == 0


def test_crc_residue_zero():
    # A stream followed by its own CRC hashes to 0 (validity rule the
    # decoder relies on; reference: src/crc.rs residue check).
    data = b"frame header and contents"
    c8 = crc.crc8(data)
    assert crc.crc8(data + bytes([c8])) == 0
    c16 = crc.crc16(data)
    assert crc.crc16(data + c16.to_bytes(2, "big")) == 0


def test_crc_streaming_matches_oneshot():
    data = bytes(range(256)) * 3
    s = crc.Crc16()
    s.update(data[:100])
    s.update(data[100:])
    assert s.value == crc.crc16(data)


def test_crc_python_matches_native():
    pytest.importorskip("flac_codec_tpu.native")
    from flac_codec_tpu import native

    nat = native.load()
    if nat is None:
        pytest.skip("native engine unavailable")
    data = bytes(range(256)) * 7
    # force python path by calling table loop directly
    table8 = crc.CRC8_TABLE
    v = 0
    for b in data:
        v = table8[v ^ b]
    assert nat.crc8(data) == v


# -- BitWriter / BitReader --------------------------------------------------

def test_bit_roundtrip_simple():
    w = BitWriter()
    w.write(0b101, 3)
    w.write(0xFFEE, 16)
    w.write_signed(-5, 6)
    w.write_unary(11)
    w.write_bit(True)
    w.byte_align()
    data = w.getvalue()

    r = BitReader(data)
    assert r.read(3) == 0b101
    assert r.read(16) == 0xFFEE
    assert r.read_signed(6) == -5
    assert r.read_unary() == 11
    assert r.read_bit() is True


def test_bit_roundtrip_exhaustive_widths():
    rng = np.random.default_rng(0)
    vals = []
    w = BitWriter()
    for width in range(1, 57):
        v = int(rng.integers(0, 1 << width))
        vals.append((v, width))
        w.write(v, width)
    w.byte_align()
    r = BitReader(w.getvalue())
    for v, width in vals:
        assert r.read(width) == v


def test_signed_roundtrip():
    w = BitWriter()
    cases = [(-1, 2), (1, 2), (-128, 8), (127, 8), (-(1 << 31), 32),
             ((1 << 31) - 1, 32), (0, 5), (-17, 33), (1 << 32, 34)]
    for v, width in cases:
        w.write_signed(v, width)
    w.byte_align()
    r = BitReader(w.getvalue())
    for v, width in cases:
        assert r.read_signed(width) == v


def test_unary_large_and_cross_byte():
    w = BitWriter()
    for q in [0, 1, 7, 8, 9, 63, 64, 100, 1000]:
        w.write_unary(q)
    w.byte_align()
    r = BitReader(w.getvalue())
    for q in [0, 1, 7, 8, 9, 63, 64, 100, 1000]:
        assert r.read_unary() == q


def test_rice_array_roundtrip():
    rng = np.random.default_rng(42)
    for k in [0, 1, 4, 7, 14, 20]:
        res = rng.integers(-5000, 5000, size=333).astype(np.int32)
        w = BitWriter()
        w.write(0b10, 2)  # misalign
        w.write_rice_array(res, k)
        w.byte_align()
        r = BitReader(w.getvalue())
        assert r.read(2) == 0b10
        got = r.read_rice_array(len(res), k)
        np.testing.assert_array_equal(got, res)


def test_rice_scalar_matches_array():
    res = np.array([0, 1, -1, 2, -2, 100, -100], dtype=np.int32)
    k = 3
    w1 = BitWriter()
    w1.write_rice_array(res, k)
    w1.byte_align()
    w2 = BitWriter()
    for v in res:
        v = int(v)
        u = ((-v - 1) << 1) + 1 if v < 0 else v << 1
        w2.write_unary(u >> k)
        w2.write(u & ((1 << k) - 1), k)
    w2.byte_align()
    assert w1.getvalue() == w2.getvalue()


def test_signed_array_roundtrip():
    rng = np.random.default_rng(7)
    for width in [1, 2, 5, 8, 17, 31, 33]:
        lo, hi = -(1 << (width - 1)), (1 << (width - 1)) - 1
        vals = rng.integers(lo, hi + 1, size=100).astype(np.int64)
        w = BitWriter()
        w.write(1, 1)
        w.write_signed_array(vals, width)
        w.byte_align()
        r = BitReader(w.getvalue())
        assert r.read(1) == 1
        got = r.read_signed_array(len(vals), width)
        np.testing.assert_array_equal(got, vals)


def test_recorder_playback():
    rec = BitWriter()
    rec.write(0xABC, 12)
    rec.write_unary(5)
    # playback into aligned and misaligned writers
    for head_bits in range(8):
        w = BitWriter()
        if head_bits:
            w.write(0, head_bits)
        w.append_recorder(rec)
        w.byte_align()
        r = BitReader(w.getvalue())
        if head_bits:
            r.read(head_bits)
        assert r.read(12) == 0xABC
        assert r.read_unary() == 5


def test_reader_eof():
    r = BitReader(b"\x01")
    r.read(8)
    with pytest.raises(EndOfStream):
        r.read(1)


def test_reader_streaming_refill():
    import io

    payload = bytes(range(256)) * 300
    r = BitReader.from_stream(io.BytesIO(payload))
    out = bytearray()
    for _ in range(len(payload)):
        out.append(r.read(8))
    assert bytes(out) == payload
    assert r.at_eof()


def test_rice_array_wide_values_roundtrip():
    """33-bit side-channel residuals exceed int32 (reference
    SubframeWidth::Wide); both rice array paths must stay exact."""
    import numpy as np

    from flac_codec_tpu.bitio import BitReader, BitWriter

    wide = np.array([0, -1, 5, 2**31 + 5, -(2**31) - 99, 2**33,
                     -(2**32) - 1, 123456789] * 4, dtype=np.int64)
    small = np.array([0, -1, 5, 1000, -4096, 77] * 4, dtype=np.int64)
    # unary length is u >> k: keep quotients small per parameter
    for k, vals in ((0, small), (7, small), (22, wide), (30, wide)):
        w = BitWriter()
        w.write_rice_array(vals, k)
        w.byte_align()
        r = BitReader(w.getvalue())
        out = r.read_rice_array(len(vals), k)
        np.testing.assert_array_equal(out, vals)
