"""Adversarial mutation conformance (VERDICT r2 item 5).

The conformance corpus (format/genstream + test_conformance) shows valid
streams decode; this matrix shows INVALID streams are rejected with the
precise error variant — the closest check to a second implementation this
image allows.  Each case either surgically mutates one header field of a
known-good stream (re-fixing CRC-8/16 so the decoder reaches the target
validation, reference checks: src/stream.rs:151-313) or hand-builds a
frame whose subframe carries exactly one malformed construct
(src/decode.rs:1635-1736).
"""

import io

import numpy as np
import pytest

from flac_codec_tpu import crc as crcmod
from flac_codec_tpu import errors as E
from flac_codec_tpu.bitio import BitWriter
from flac_codec_tpu.decode import FlacSampleReader
from flac_codec_tpu.format.frame import FrameHeader
from flac_codec_tpu.format.genstream import (FrameSpec, SubframeSpec,
                                             build_stream)

BS = 192          # block-size code 0b0001, no escape bytes
RATE = 44100      # sample-rate code 0b1001
BPS = 16          # bps code 0b100


def base_stream(seed=0):
    rng = np.random.default_rng(seed)
    res = rng.integers(-40, 40, BS - 2)
    subs = [SubframeSpec(type="fixed", warmups=np.array([10, 12]),
                         residuals=res, order=2)
            for _ in range(2)]
    return build_stream([FrameSpec(block_size=BS, subframes=subs)],
                        sample_rate=RATE, bps=BPS)[0]


def frame_off(stream: bytes) -> int:
    """Offset of the first frame (sync code) in the file."""
    i = stream.index(b"\xff\xf8", 4)
    return i


def refix_crcs(stream: bytes, off: int, hdr_len: int) -> bytes:
    """Recompute header CRC-8 and frame CRC-16 after a field mutation so
    decode reaches the semantic validation rather than the CRC check."""
    b = bytearray(stream)
    b[off + hdr_len - 1] = crcmod.crc8(bytes(b[off:off + hdr_len - 1]))
    body = bytes(b[off:-2])
    b[-2:] = crcmod.crc16(body).to_bytes(2, "big")
    return bytes(b)


def decode_all(stream: bytes):
    with FlacSampleReader(io.BytesIO(stream)) as r:
        while len(r.read(65536)):
            pass


HDR_LEN = 6  # sync+strategy(2) + codes(2) + frame number 0 (1) + crc8(1)


def mutate_hdr(stream, byte_idx, value, fix=True):
    off = frame_off(stream)
    b = bytearray(stream)
    b[off + byte_idx] = value
    return refix_crcs(bytes(b), off, HDR_LEN) if fix else bytes(b)


def test_base_stream_decodes():
    decode_all(base_stream())


@pytest.mark.parametrize("byte_idx,value,err", [
    (0, 0xFE, E.InvalidSyncCode),        # sync high bits
    (1, 0xF0, E.InvalidSyncCode),        # sync low bits
    (2, 0x09, E.InvalidBlockSize),       # block-size code 0b0000 reserved
    (2, 0x1F, E.InvalidSampleRate),      # sample-rate code 0b1111 invalid
    (3, 0x16, E.InvalidBitsPerSample),   # bps code 0b011 reserved
    (2, 0x29, E.BlockSizeMismatch),      # 576-block vs 192 streaminfo
    (2, 0x1A, E.SampleRateMismatch),     # 48000 vs 44100 streaminfo
    (3, 0x08, E.ChannelsMismatch),       # mono vs stereo streaminfo
    (3, 0x1C, E.BitsPerSampleMismatch),  # 24 bps vs 16 streaminfo
    (4, 0x80, E.InvalidFrameNumber),     # continuation byte as prefix
    (4, 0xFF, E.InvalidFrameNumber),     # 8-byte prefix too long
])
def test_header_field_mutations(byte_idx, value, err):
    with pytest.raises(err):
        decode_all(mutate_hdr(base_stream(), byte_idx, value))


@pytest.mark.parametrize("ca", [0b1011, 0b1100, 0b1101, 0b1110, 0b1111])
def test_reserved_channel_assignment(ca):
    with pytest.raises(E.InvalidChannels):
        decode_all(mutate_hdr(base_stream(), 3, (ca << 4) | 0x08))


def test_header_crc8_mismatch():
    s = base_stream()
    off = frame_off(s)
    b = bytearray(s)
    b[off + HDR_LEN - 1] ^= 0x55       # corrupt CRC-8 only
    with pytest.raises(E.Crc8Mismatch):
        decode_all(bytes(b))


def test_frame_crc16_mismatch():
    s = bytearray(base_stream())
    s[-1] ^= 0x01
    with pytest.raises(E.Crc16Mismatch):
        decode_all(bytes(s))


# ---------------------------------------------------------------------------
# Subframe-level constructs: build the frame body by hand with exactly one
# malformed field, valid CRCs, valid header.
# ---------------------------------------------------------------------------

def handmade_stream(body_fn):
    """Stream whose single frame's subframes come from ``body_fn(w)``."""
    template = base_stream()
    off = frame_off(template)
    w = BitWriter()
    FrameHeader(blocking_strategy=False, block_size=BS, sample_rate=RATE,
                channel_assignment=0b0001, bits_per_sample=BPS,
                frame_number=0).write(w)
    body_fn(w)
    w.byte_align()
    body = w.getvalue()
    frame = body + crcmod.crc16(body).to_bytes(2, "big")
    return template[:off] + frame


def good_subframe(w):
    """A valid constant subframe (fills one channel)."""
    w.write(0, 1); w.write(0, 6); w.write(0, 1)
    w.write_signed(3, BPS)


def subhdr(w, code, wasted_flag=0):
    w.write(0, 1); w.write(code, 6); w.write(wasted_flag, 1)


@pytest.mark.parametrize("code", [2, 3, 4, 5, 6, 7] + list(range(13, 32)))
def test_reserved_subframe_type(code):
    def body(w):
        subhdr(w, code)
        w.write(0, BPS)  # filler the parser must never reach
        good_subframe(w)
    with pytest.raises(E.InvalidSubframeHeader):
        decode_all(handmade_stream(body))


def test_subframe_pad_bit():
    def body(w):
        w.write(1, 1); w.write(0, 6); w.write(0, 1)
        w.write_signed(3, BPS)
        good_subframe(w)
    with pytest.raises(E.InvalidSubframeHeader):
        decode_all(handmade_stream(body))


def test_excessive_wasted_bits():
    def body(w):
        subhdr(w, 0, wasted_flag=1)
        w.write(0, BPS - 1); w.write(1, 1)   # wasted = bps -> eff 0
        w.write_signed(0, 1)
        good_subframe(w)
    with pytest.raises(E.ExcessiveWastedBits):
        decode_all(handmade_stream(body))


def test_lpc_precision_escape():
    def body(w):
        subhdr(w, 0b100000)                  # LPC order 1
        w.write_signed(5, BPS)               # warm-up
        w.write(15, 4)                       # precision code 0b1111
        good_subframe(w)
    with pytest.raises(E.InvalidQlpPrecision):
        decode_all(handmade_stream(body))


def test_negative_lpc_shift():
    def body(w):
        subhdr(w, 0b100000)
        w.write_signed(5, BPS)
        w.write(11, 4)                       # precision 12
        w.write_signed(-1, 5)                # negative shift
        good_subframe(w)
    with pytest.raises(E.NegativeLpcShift):
        decode_all(handmade_stream(body))


@pytest.mark.parametrize("method", [2, 3])
def test_reserved_coding_method(method):
    def body(w):
        subhdr(w, 0b001000 | 2)              # fixed order 2
        w.write_signed(1, BPS); w.write_signed(2, BPS)
        w.write(method, 2); w.write(0, 4)
        good_subframe(w)
    with pytest.raises(E.InvalidCodingMethod):
        decode_all(handmade_stream(body))


@pytest.mark.parametrize("po", [6, 7])
def test_invalid_partition_order(po):
    # BS=192: po 6 -> 3-sample partitions < order 4; po 7 -> 192 % 128 != 0
    def body(w):
        subhdr(w, 0b001000 | 4)              # fixed order 4
        for v in (1, 2, 3, 4):
            w.write_signed(v, BPS)
        w.write(0, 2); w.write(po, 4)
        good_subframe(w)
    with pytest.raises(E.InvalidPartitionOrder):
        decode_all(handmade_stream(body))


def test_truncated_frame_body():
    s = base_stream()
    off = frame_off(s)
    with pytest.raises((E.EndOfStream, E.FlacError)):
        decode_all(s[:off + 10])


def test_scan_frames_rejects_mutants(tmp_path):
    """The native boundary scan must stop (not mis-frame) on mutants."""
    from flac_codec_tpu import native
    from flac_codec_tpu.decode import Decoder

    nat = native.load()
    if nat is None:
        pytest.skip("native engine unavailable")
    for mutant in (mutate_hdr(base_stream(), 2, 0x09),     # reserved code
                   mutate_hdr(base_stream(), 0, 0xFE),     # broken sync
                   bytes(bytearray(base_stream()[:-1])
                         + b"\x00")):                      # bad CRC-16
        dec = Decoder(io.BytesIO(mutant))
        si = dec.streaminfo
        scan = nat.scan_frames(dec.r.np_view(), dec.r.pos, 16,
                               si.sample_rate, si.channels,
                               si.bits_per_sample, si.maximum_block_size,
                               dec.total_samples)
        assert scan["n"] == 0 and scan["error"] != 0


# ---------------------------------------------------------------------------
# Mid-stream mutations: the same field classes on frame 2 of 3, so the
# rejection travels through the native bulk decoder's stop + precise
# scalar reparse (decode.py:222-272) after a successful first frame.
# ---------------------------------------------------------------------------

def multi_stream(seed=1):
    rng = np.random.default_rng(seed)
    frames = []
    for f in range(3):
        res = rng.integers(-40, 40, BS - 2)
        subs = [SubframeSpec(type="fixed", warmups=np.array([7 + f, 9]),
                             residuals=res, order=2) for _ in range(2)]
        frames.append(FrameSpec(block_size=BS, subframes=subs))
    return build_stream(frames, sample_rate=RATE, bps=BPS)


def second_frame_off(stream: bytes) -> int:
    first = frame_off(stream)
    return stream.index(b"\xff\xf8", first + 2)


def refix_frame2(stream: bytes, off2: int, end2: int, hdr_len: int) -> bytes:
    b = bytearray(stream)
    b[off2 + hdr_len - 1] = crcmod.crc8(bytes(b[off2:off2 + hdr_len - 1]))
    body = bytes(b[off2:end2 - 2])
    b[end2 - 2:end2] = crcmod.crc16(body).to_bytes(2, "big")
    return bytes(b)


@pytest.mark.parametrize("byte_idx,value,err", [
    (2, 0x09, E.InvalidBlockSize),
    (2, 0x1F, E.InvalidSampleRate),
    (3, 0x16, E.InvalidBitsPerSample),
    (2, 0x1A, E.SampleRateMismatch),
    (3, 0x08, E.ChannelsMismatch),
    (3, 0x1C, E.BitsPerSampleMismatch),
    (3, 0xB8, E.InvalidChannels),
])
def test_second_frame_mutations(byte_idx, value, err):
    stream, pcm = multi_stream()
    off2 = second_frame_off(stream)
    end2 = stream.index(b"\xff\xf8", off2 + 2)  # frame 3 start
    b = bytearray(stream)
    b[off2 + byte_idx] = value
    mutant = refix_frame2(bytes(b), off2, end2, HDR_LEN)
    # frame 1 must still decode, then the error surfaces
    with FlacSampleReader(io.BytesIO(mutant)) as r:
        got = r.read(BS * 2)
        assert (got == pcm[:BS * 2]).all()
        with pytest.raises(err):
            while len(r.read(65536)):
                pass


def test_second_frame_crc16():
    stream, pcm = multi_stream()
    off2 = second_frame_off(stream)
    end2 = stream.index(b"\xff\xf8", off2 + 2)
    b = bytearray(stream)
    b[end2 - 1] ^= 0x10
    with FlacSampleReader(io.BytesIO(bytes(b))) as r:
        assert (r.read(BS * 2) == pcm[:BS * 2]).all()
        with pytest.raises(E.Crc16Mismatch):
            while len(r.read(65536)):
                pass


@pytest.mark.parametrize("nbyte", list(range(1, 8)))
def test_bitflips_in_every_header_byte_detected(nbyte):
    """Any single bit flip in the first header bytes must error (CRC-8
    guards whatever field validation does not)."""
    s = base_stream()
    off = frame_off(s)
    for bit in range(8):
        b = bytearray(s)
        b[off + nbyte - 1] ^= 1 << bit
        if bytes(b) == s:
            continue
        with pytest.raises(E.FlacError):
            decode_all(bytes(b))
