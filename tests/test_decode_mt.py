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
