"""Decoder conformance matrix — the IETF-testbench stand-in (VERDICT r1
item 2; reference decode semantics: src/stream.rs:279-313,
src/decode.rs:1405-1421, 1494-1856).

Every case builds a valid stream with the generator
(format/genstream.py), then asserts:
  * full decode is sample-exact vs the generator's PCM oracle,
  * verify() reports MD5_MATCH,
and (fixed-blocksize, native-eligible cases) feeds the stream through the
BatchDecoder device path too.
"""

import io
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from flac_codec_tpu.decode import FlacSampleReader, Verified, verify
from flac_codec_tpu.format.genstream import (FrameSpec, SubframeSpec,
                                             build_stream)
from flac_codec_tpu.format.frame import ChannelAssignment
from flac_codec_tpu.format.subframe import (CONSTANT, FIXED, LPC, VERBATIM)

RNG = np.random.default_rng(2026)


def _decode_and_check(data: bytes, pcm: np.ndarray, device: bool = True):
    got = FlacSampleReader(io.BytesIO(data)).read_to_end()
    np.testing.assert_array_equal(np.asarray(got, dtype=np.int64), pcm)
    assert verify(io.BytesIO(data)) is Verified.MD5_MATCH
    if device:
        from flac_codec_tpu.parallel.batch_decode import BatchDecoder

        dev = BatchDecoder(io.BytesIO(data), batch_frames=4).read_all_device()
        np.testing.assert_array_equal(
            np.asarray(dev, dtype=np.int64).reshape(-1), pcm)


def _verbatim(n, bps, scale=None, seed=None):
    r = RNG if seed is None else np.random.default_rng(seed)
    scale = scale or (1 << (bps - 2))
    return SubframeSpec(VERBATIM, values=r.integers(-scale, scale, n))


def _signal(n, scale, seed=None):
    """Bounded smooth-ish signal: random walk clipped to +-scale."""
    r = RNG if seed is None else np.random.default_rng(seed)
    walk = np.cumsum(r.integers(-scale // 8 - 1, scale // 8 + 2, n))
    return np.clip(walk, -scale, scale).astype(np.int64)


def _fixed(n, order, scale=2000, wasted=0, **kw):
    """FIXED subframe built signal-first so samples stay in range."""
    x = _signal(n, scale)
    res = x.copy()
    for _ in range(order):
        res = np.diff(res)
    return SubframeSpec(FIXED, order=order, warmups=x[:order],
                        residuals=res[order - order:] if order else res,
                        wasted=wasted, **kw)


def _lpc(n, order, shift, scale=2000, precision=15, coeffs=None, **kw):
    """LPC subframe built signal-first: residuals derived from a bounded
    signal under the given predictor, so reconstruction never explodes."""
    if coeffs is None:
        # stable-ish: dominant first tap near (1 << shift)
        coeffs = np.zeros(order, dtype=np.int64)
        coeffs[0] = (1 << shift) - 1
        if order > 1:
            coeffs[1:] = RNG.integers(-(1 << max(shift - 3, 0)),
                                      (1 << max(shift - 3, 0)) + 1,
                                      order - 1)
    coeffs = np.asarray(coeffs, dtype=np.int64)
    x = _signal(n, scale)
    res = x.copy()
    for i in range(order, n):
        acc = int((coeffs * x[i - order:i][::-1]).sum())
        res[i] = x[i] - (acc >> shift)
    return SubframeSpec(
        LPC, order=order, coeffs=coeffs, shift=shift, precision=precision,
        warmups=x[:order], residuals=res[order:], **kw)


# ---------------------------------------------------------------------------
# 1. variable-blocksize streams (blocking_strategy=1, sample-number varints)
# ---------------------------------------------------------------------------

def test_variable_blocksize_stream():
    sizes = [576, 1152, 192, 2048, 256, 100, 16]
    frames = [FrameSpec(n, [_verbatim(n, 16), _verbatim(n, 16)])
              for n in sizes]
    data, pcm = build_stream(frames, variable=True)
    _decode_and_check(data, pcm)


def test_variable_blocksize_short_last_frame():
    frames = [FrameSpec(n, [_verbatim(n, 16)]) for n in (4096, 4096, 11)]
    data, pcm = build_stream(frames, variable=True)
    _decode_and_check(data, pcm)


def test_variable_blocksize_undeclared_total():
    frames = [FrameSpec(n, [_fixed(n, 2), _fixed(n, 1)])
              for n in (1024, 768, 512)]
    data, pcm = build_stream(frames, variable=True, declare_total=False)
    _decode_and_check(data, pcm)


# ---------------------------------------------------------------------------
# 2. block-size codes: every common code + both escapes
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n", [192, 576, 1152, 2304, 4608, 256, 512, 1024,
                               2048, 4096, 8192, 16384, 32768,   # code table
                               17, 255, 256,                     # 8-bit esc
                               257, 300, 65535])                 # 16-bit esc
def test_block_size_codes(n):
    frames = [FrameSpec(n, [_verbatim(n, 16, seed=n)])]
    data, pcm = build_stream(frames)
    _decode_and_check(data, pcm)


# ---------------------------------------------------------------------------
# 3. sample-rate codes: common table + kHz/Hz/dHz escapes + streaminfo
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("rate", [
    88200, 176400, 192000, 8000, 16000, 22050, 24000, 32000, 44100, 48000,
    96000,            # common 4-bit codes
    128000,           # 8-bit kHz escape
    44001,            # 16-bit Hz escape
    500000,           # 16-bit dHz escape
])
def test_sample_rate_codes(rate):
    n = 256
    frames = [FrameSpec(n, [_fixed(n, 1)])]
    data, pcm = build_stream(frames, sample_rate=rate)
    _decode_and_check(data, pcm)


def test_sample_rate_streaminfo_escape_non_subset():
    """Rate > dHz-escape range: frame pulls the rate from STREAMINFO
    (non-subset stream, reference: src/stream.rs:214-240)."""
    n = 256
    frames = [FrameSpec(n, [_fixed(n, 2)])]
    data, pcm = build_stream(frames, sample_rate=1000000, non_subset=True)
    _decode_and_check(data, pcm)


# ---------------------------------------------------------------------------
# 4. bits-per-sample: all codes + streaminfo escape (non-standard width)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bps", [8, 12, 16, 20, 24, 32])
def test_bps_codes(bps):
    n = 512
    frames = [FrameSpec(n, [_verbatim(n, bps), _verbatim(n, bps)])]
    data, pcm = build_stream(frames, bps=bps)
    _decode_and_check(data, pcm)


@pytest.mark.parametrize("bps", [17, 27])
def test_bps_streaminfo_escape_non_subset(bps):
    n = 256
    frames = [FrameSpec(n, [_verbatim(n, bps)])]
    data, pcm = build_stream(frames, bps=bps, non_subset=True)
    _decode_and_check(data, pcm)


# ---------------------------------------------------------------------------
# 5. wasted bits, incl. extremes and side channels
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("wasted", [1, 7, 15])
def test_wasted_bits_extremes(wasted):
    n = 512
    bps = 16
    eff = bps - wasted   # eff=1 means pre-shift samples in {-1, 0}
    lo, hi = -(1 << (eff - 1)), (1 << (eff - 1)) - 1
    sub = SubframeSpec(VERBATIM, wasted=wasted,
                       values=RNG.integers(lo, hi + 1, n))
    data, pcm = build_stream([FrameSpec(n, [sub])])
    _decode_and_check(data, pcm)


def test_wasted_bits_on_side_channel():
    n = 256
    left = _fixed(n, 2, scale=50, wasted=3)
    side = _fixed(n, 1, scale=20, wasted=2)
    frames = [FrameSpec(n, [left, side],
                        assignment=ChannelAssignment.LEFT_SIDE)]
    data, pcm = build_stream(frames)
    _decode_and_check(data, pcm)


# ---------------------------------------------------------------------------
# 6. stereo decorrelation incl. 32-bps wide side channels
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("assignment", [
    ChannelAssignment.LEFT_SIDE, ChannelAssignment.SIDE_RIGHT,
    ChannelAssignment.MID_SIDE])
def test_decorrelation_modes(assignment):
    n = 1024
    frames = [FrameSpec(n, [_fixed(n, 2), _fixed(n, 3)],
                        assignment=assignment)]
    data, pcm = build_stream(frames)
    _decode_and_check(data, pcm)


@pytest.mark.parametrize("assignment", [
    ChannelAssignment.LEFT_SIDE, ChannelAssignment.SIDE_RIGHT,
    ChannelAssignment.MID_SIDE])
def test_32bps_wide_side(assignment):
    """33-bit side channels (reference wide path:
    src/decode.rs:1586-1625, stream.rs:2050-2056)."""
    n = 256
    # craft from valid int32 left/right so the decorrelated PCM is in
    # range while the side subframe itself needs 33 bits
    left = RNG.integers(-(1 << 31), (1 << 31) - 1, n).astype(np.int64)
    right = RNG.integers(-(1 << 31), (1 << 31) - 1, n).astype(np.int64)
    left[0], right[0] = (1 << 31) - 1, -(1 << 31)  # side = 2^32 - 1
    if assignment == ChannelAssignment.LEFT_SIDE:
        s0, s1 = left, left - right
    elif assignment == ChannelAssignment.SIDE_RIGHT:
        s0, s1 = left - right, right
    else:  # MID_SIDE
        s0, s1 = (left + right) >> 1, left - right
    frames = [FrameSpec(n, [SubframeSpec(VERBATIM, values=s0),
                            SubframeSpec(VERBATIM, values=s1)],
                        assignment=assignment)]
    data, pcm = build_stream(frames, bps=32)
    np.testing.assert_array_equal(
        pcm.reshape(-1, 2).T, np.stack([left, right]))
    _decode_and_check(data, pcm, device=False)  # int32 device buffers


# ---------------------------------------------------------------------------
# 7. residual partitions: orders, escapes, constants, rice2
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("po", [0, 1, 2, 4, 6])
def test_partition_orders(po):
    n = 4096
    frames = [FrameSpec(n, [_fixed(n, 2, partition_order=po)])]
    data, pcm = build_stream(frames)
    _decode_and_check(data, pcm)


def test_escape_partitions():
    n = 1024
    frames = [FrameSpec(n, [_fixed(
        n, 1, partition_order=2,
        partition_kinds=["escape", "rice", "escape", "rice"])])]
    data, pcm = build_stream(frames)
    _decode_and_check(data, pcm)


def test_constant_partitions():
    n = 1024
    res = np.zeros(n - 1, dtype=np.int64)
    res[: n // 4 - 1] = RNG.integers(-50, 50, n // 4 - 1)
    sub = SubframeSpec(FIXED, order=1, warmups=np.array([1000]),
                       residuals=res, partition_order=2,
                       partition_kinds=["rice", "constant", "constant",
                                        "constant"])
    data, pcm = build_stream([FrameSpec(n, [sub])])
    _decode_and_check(data, pcm)


def test_rice2_partitions():
    """5-bit Rice parameters (method 1), legal at any bps on decode."""
    n = 1024
    frames = [FrameSpec(n, [_fixed(n, 2, scale=100000, rice2=True,
                                   partition_order=1)])]
    data, pcm = build_stream(frames, bps=24)
    _decode_and_check(data, pcm)


def test_large_rice_parameters():
    n = 256
    frames = [FrameSpec(n, [SubframeSpec(
        FIXED, order=0,
        warmups=np.array([], dtype=np.int64),
        residuals=RNG.integers(-(1 << 20), 1 << 20, n))])]
    data, pcm = build_stream(frames, bps=24)
    _decode_and_check(data, pcm)


# ---------------------------------------------------------------------------
# 8. subframe types and predictor orders
# ---------------------------------------------------------------------------

def test_constant_subframes():
    n = 2048
    frames = [FrameSpec(n, [
        SubframeSpec(CONSTANT, values=np.array([-12345])),
        SubframeSpec(CONSTANT, values=np.array([0]))])]
    data, pcm = build_stream(frames)
    _decode_and_check(data, pcm)


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_orders(order):
    n = 512
    frames = [FrameSpec(n, [_fixed(n, order)])]
    data, pcm = build_stream(frames)
    _decode_and_check(data, pcm)


@pytest.mark.parametrize("order", [1, 2, 8, 12, 31, 32])
def test_lpc_orders(order):
    n = 512
    frames = [FrameSpec(n, [_lpc(n, order, shift=12)])]
    data, pcm = build_stream(frames)
    _decode_and_check(data, pcm)


def test_lpc_shift_zero_and_low_precision():
    n = 256
    frames = [FrameSpec(n, [_lpc(n, 2, shift=0, precision=4,
                                 coeffs=np.array([1, -1]), scale=30)])]
    data, pcm = build_stream(frames)
    _decode_and_check(data, pcm)


def test_mixed_subframe_types_per_frame():
    n = 1024
    frames = [FrameSpec(n, [
        SubframeSpec(CONSTANT, values=np.array([77])),
        _verbatim(n, 16),
        _fixed(n, 3),
        _lpc(n, 8, shift=10)])]
    data, pcm = build_stream(frames)
    _decode_and_check(data, pcm)


def test_eight_channels():
    n = 256
    frames = [FrameSpec(n, [_fixed(n, c % 5) for c in range(8)])]
    data, pcm = build_stream(frames)
    _decode_and_check(data, pcm)


# ---------------------------------------------------------------------------
# 9. stream-level shapes
# ---------------------------------------------------------------------------

def test_short_last_frame_fixed_blocking():
    frames = [FrameSpec(4096, [_fixed(4096, 2)]),
              FrameSpec(4096, [_fixed(4096, 2)]),
              FrameSpec(11, [_verbatim(11, 16)])]
    data, pcm = build_stream(frames)
    _decode_and_check(data, pcm)


def test_single_sample_stream():
    frames = [FrameSpec(16, [_verbatim(16, 16)]),
              FrameSpec(1, [_verbatim(1, 16)])]
    data, pcm = build_stream(frames)
    _decode_and_check(data, pcm)


def test_undeclared_total_fixed_blocking():
    frames = [FrameSpec(512, [_fixed(512, 1)]) for _ in range(5)]
    data, pcm = build_stream(frames, declare_total=False)
    _decode_and_check(data, pcm)


def test_many_frame_stream_through_native_bulk():
    """Enough frames that the native bulk (and MT) paths engage."""
    frames = [FrameSpec(1024, [_fixed(1024, 2), _fixed(1024, 3)])
              for _ in range(40)]
    data, pcm = build_stream(frames)
    _decode_and_check(data, pcm)


# ---------------------------------------------------------------------------
# 10. PARITY_GOLDEN.json pins (cross-implementation encoder parity artifacts)
# ---------------------------------------------------------------------------

_GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "..",
                            "PARITY_GOLDEN.json")
_FIXDIR = "/root/reference/tests/data"


@pytest.mark.skipif(not (os.path.exists(_GOLDEN_PATH)
                         and os.path.isdir(_FIXDIR)),
                    reason="goldens or reference fixtures unavailable")
def test_parity_golden_pins():
    """The committed PARITY_GOLDEN.json must match the live decoder and
    encoder so the cross-implementation goldens can never drift silently
    (VERDICT r3 item 5; recipe in tools/make_parity_golden.py).

    Every fixture's decoded-PCM MD5 is re-checked; the re-encode
    frames_md5 is re-checked for the small fixtures at both presets and
    for sine.flac at the default preset (its best-preset encode is too
    slow for every CI run — tools/make_parity_golden.py covers it)."""
    import hashlib
    import json

    from flac_codec_tpu import metadata as meta
    from flac_codec_tpu.encode import FlacSampleWriter, Options
    from tools.make_parity_golden import frames_md5

    with open(_GOLDEN_PATH) as fp:
        golden = json.load(fp)
    presets = {"default": Options().no_seektable().no_padding(),
               "best": Options.best().no_seektable().no_padding()}
    assert golden["fixtures"], "empty goldens"
    for name, rec in golden["fixtures"].items():
        path = os.path.join(_FIXDIR, name)
        with open(path, "rb") as fp:
            r = FlacSampleReader(fp)
            pcm = r.read_to_end()
        si_width = max(1, (rec["bits_per_sample"] + 7) // 8)
        assert hashlib.md5(np.asarray(pcm).astype(
            f"<i{si_width}").tobytes()).hexdigest() == rec["pcm_md5"], name
        for pname, opts in presets.items():
            if len(pcm) > 1000 and not (name == "sine.flac"
                                        and pname == "default"):
                continue
            buf = io.BytesIO()
            w = FlacSampleWriter(buf, opts, rec["sample_rate"],
                                 rec["bits_per_sample"], rec["channels"],
                                 total_samples=len(pcm) // rec["channels"])
            w.write(np.asarray(pcm))
            w.finalize()
            assert frames_md5(buf.getvalue()) == \
                rec["reencoded"][pname]["frames_md5"], (name, pname)
