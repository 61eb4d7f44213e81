"""Multithreaded speculative frame-parallel decode (nat_decode_frames_mt).

The MT decoder must be bit-identical to the sequential path in every
observable way — samples, block sizes, end position, error code — because
any speculation failure falls back to the sequential path inside C.
"""

import io

import numpy as np
import pytest

from flac_codec_tpu import native
from flac_codec_tpu.decode import Decoder
from flac_codec_tpu.encode import FlacSampleWriter, Options

nat = native.load()
pytestmark = pytest.mark.skipif(nat is None, reason="native engine needed")


def _encode(n_samples, seed=11, opts=None, bps=16, total=True):
    rng = np.random.default_rng(seed)
    # noise keeps the stream large so the >=256 KiB MT gate engages
    inter = rng.integers(-(1 << (bps - 2)), 1 << (bps - 2),
                         n_samples * 2).astype(np.int64)
    buf = io.BytesIO()
    w = FlacSampleWriter(buf, opts or Options.fast(), 44100, bps, 2,
                         total_samples=n_samples if total else None)
    w.write(inter)
    w.finalize()
    return buf.getvalue()


def _bulk(data, nthreads, remaining):
    d = Decoder(io.BytesIO(data))
    view, start = d.r.np_view(), d.r.pos
    max_block = d.streaminfo.maximum_block_size
    n_frames = 300_000 // max_block + 16
    return nat.decode_frames(view, start, n_frames, 44100, 2,
                             d.streaminfo.bits_per_sample, max_block,
                             remaining, nthreads=nthreads)


@pytest.mark.parametrize("total", [True, False],
                         ids=["known-total", "unknown-total"])
def test_mt_equals_sequential(total):
    n = 220_000
    data = _encode(n, total=total)
    assert len(data) > (1 << 18), "stream too small to engage the MT gate"
    rem = n if total else None
    out1, sizes1, end1, err1 = _bulk(data, 1, rem)
    for nt in (2, 4, 8):
        out, sizes, end, err = _bulk(data, nt, rem)
        assert (err, end) == (err1, end1)
        np.testing.assert_array_equal(sizes, sizes1)
        np.testing.assert_array_equal(out, out1)


def test_mt_equals_sequential_on_corruption():
    n = 220_000
    data = bytearray(_encode(n))
    rng = np.random.default_rng(5)
    for _ in range(8):
        corrupt = bytearray(data)
        pos = int(rng.integers(len(data) // 2, len(data) - 1))
        corrupt[pos] ^= 1 << int(rng.integers(8))
        r1 = _bulk(bytes(corrupt), 1, n)
        r4 = _bulk(bytes(corrupt), 4, n)
        assert (r1[2], r1[3]) == (r4[2], r4[3])  # end pos + error code
        np.testing.assert_array_equal(r1[1], r4[1])
        np.testing.assert_array_equal(r1[0], r4[0])


def test_mt_trailing_garbage():
    n = 220_000
    data = _encode(n) + b"\x55" * 1000
    out1, sizes1, end1, err1 = _bulk(data, 1, None)
    out4, sizes4, end4, err4 = _bulk(data, 4, None)
    assert (err1, end1) == (err4, end4)
    np.testing.assert_array_equal(out1, out4)


def test_mt_full_reader_path():
    """Decoder/SampleReader route through decode_frames: MD5-exact PCM."""
    from flac_codec_tpu.decode import Verified, verify

    n = 220_000
    data = _encode(n)
    assert verify(io.BytesIO(data)) is Verified.MD5_MATCH


@pytest.mark.parametrize("opts,bps,seed", [
    (Options.best(), 16, 3),      # LPC 12 / partition order 6
    (Options(), 16, 4),           # default preset, mid-side
    (Options.best(), 24, 5),      # rice2 (5-bit params) path
    (Options.fast(), 8, 6),       # 8-bit samples
], ids=["best", "default", "best-24bit", "fast-8bit"])
def test_mt_equals_sequential_presets(opts, bps, seed):
    """MT speculation must stay bit-identical across predictor types,
    partition orders, rice2, and sample widths (the earlier tests only
    covered the fast preset at 16-bit)."""
    n = 220_000
    data = _encode(n, seed=seed, opts=opts.no_seektable(), bps=bps)
    assert len(data) > (1 << 18)
    out1, sizes1, end1, err1 = _bulk(data, 1, n)
    out4, sizes4, end4, err4 = _bulk(data, 4, n)
    assert (err1, end1) == (err4, end4)
    np.testing.assert_array_equal(sizes1, sizes4)
    np.testing.assert_array_equal(out1, out4)


def test_mt_equals_sequential_structured_signal():
    """Wasted bits + silent stretches + constant subframes: the subframe
    types the noise generator never produces."""
    n = 220_000
    rng = np.random.default_rng(9)
    t = np.arange(n)
    l = ((2000 * np.sin(t / 29.0)).astype(np.int64) >> 0 << 4)  # wasted 4
    r = (900 * np.sin(t / 13.0)).astype(np.int64)
    l[40_000:80_000] = 0                                        # silence
    r[100_000:140_000] = -777                                   # constant
    inter = np.empty(2 * n, np.int64)
    inter[0::2], inter[1::2] = l, r
    buf = io.BytesIO()
    w = FlacSampleWriter(buf, Options(), 44100, 16, 2, total_samples=n)
    w.write(inter)
    w.finalize()
    data = buf.getvalue()
    out1, sizes1, end1, err1 = _bulk(data, 1, n)
    out4, sizes4, end4, err4 = _bulk(data, 4, n)
    assert (err1, end1) == (err4, end4)
    np.testing.assert_array_equal(sizes1, sizes4)
    np.testing.assert_array_equal(out1, out4)


def test_mt_equals_sequential_early_corruption():
    """Bit flips in the FIRST half (speculation anchors land past the
    corruption) must produce the same end/error/samples as sequential."""
    n = 220_000
    data = _encode(n)
    rng = np.random.default_rng(17)
    for _ in range(8):
        corrupt = bytearray(data)
        pos = int(rng.integers(8192, len(data) // 2))
        corrupt[pos] ^= 1 << int(rng.integers(8))
        r1 = _bulk(bytes(corrupt), 1, n)
        r4 = _bulk(bytes(corrupt), 4, n)
        assert (r1[2], r1[3]) == (r4[2], r4[3])
        np.testing.assert_array_equal(r1[1], r4[1])
        np.testing.assert_array_equal(r1[0], r4[0])


def test_mt_truncated_stream():
    """Streams cut mid-frame: same partial output and end position."""
    n = 220_000
    data = _encode(n)
    for cut in (len(data) // 3, len(data) // 2, len(data) - 17):
        part = data[:cut]
        r1 = _bulk(part, 1, None)
        r4 = _bulk(part, 4, None)
        assert (r1[2], r1[3]) == (r4[2], r4[3])
        np.testing.assert_array_equal(r1[1], r4[1])
        np.testing.assert_array_equal(r1[0], r4[0])


def test_mt_below_gate_small_stream():
    """Below the 256 KiB MT gate both paths are sequential — equality is
    trivial but pins that small streams don't regress through the gate."""
    n = 30_000
    data = _encode(n, seed=21)
    r1 = _bulk(data, 1, n)
    r8 = _bulk(data, 8, n)
    assert (r1[2], r1[3]) == (r8[2], r8[3])
    np.testing.assert_array_equal(r1[0], r8[0])
