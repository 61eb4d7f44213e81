"""Native decoder robustness: random, truncated, and bit-flipped buffers
must produce error codes (or clean EOF), never crash or read out of
bounds (the C ABI is exercised directly)."""

import io

import numpy as np
import pytest

from flac_codec_tpu import native
from flac_codec_tpu.encode import FlacSampleWriter, Options

nat = native.load()
pytestmark = pytest.mark.skipif(nat is None, reason="no native library")


def _valid_stream(n=4096 * 3, bs=1024):
    rng = np.random.default_rng(0)
    inter = rng.integers(-3000, 3000, 2 * n).astype(np.int32)
    buf = io.BytesIO()
    w = FlacSampleWriter(buf, Options(block_size=bs), 44100, 16, 2,
                         total_samples=n)
    w.write(inter)
    w.finalize()
    return np.frombuffer(buf.getvalue(), np.uint8), bs, n


def test_decode_random_garbage():
    rng = np.random.default_rng(1)
    for i in range(50):
        size = int(rng.integers(1, 5000))
        data = rng.integers(0, 256, size).astype(np.uint8)
        out, sizes, end, err = nat.decode_frames(
            data, 0, 100, 44100, 2, 16, 4096, None)
        assert err != 0 or len(sizes) == 0


def test_decode_truncated_stream():
    data, bs, n = _valid_stream()
    # find first frame (after metadata): sync scan
    for cut in [len(data) // 2, len(data) - 1, len(data) - 7, 50, 5]:
        trunc = np.ascontiguousarray(data[:cut])
        out, sizes, end, err = nat.decode_frames(
            trunc, 42 * 8, 100, 44100, 2, 16, bs, n)
        # must return cleanly - partial frames are an error/EOF, not a crash
        assert err >= 0


def test_decode_bitflips_detected_or_clean():
    data, bs, n = _valid_stream()
    rng = np.random.default_rng(3)
    meta_end = 42  # past fLaC + streaminfo header region
    for i in range(60):
        corrupted = data.copy()
        pos = int(rng.integers(meta_end, len(data)))
        corrupted[pos] ^= 1 << int(rng.integers(0, 8))
        out, sizes, end, err = nat.decode_frames(
            np.ascontiguousarray(corrupted), 42 * 8, 10 ** 6, 44100, 2, 16,
            bs, n)
        # either the CRC catches it (err) or the flip was in padding or a
        # spare region and the decode still completes; never a crash
        assert err >= 0


def test_parse_raw_garbage():
    rng = np.random.default_rng(4)
    for i in range(30):
        size = int(rng.integers(8, 3000))
        data = rng.integers(0, 256, size).astype(np.uint8)
        raw = nat.parse_frames_raw(data, 0, 16, 44100, 2, 16, 1024, None)
        assert raw["n"] >= 0


def test_long_unary_run_window_invariant():
    """Regression: a Rice code whose zero run spans >= 64 bits made
    FastBits.consume shift a 64-bit window by 64 (UB; x86 leaves the
    window unchanged), planting a stale bit below `avail` that a later
    refill OR'd into fresh data — one corrupted LSB thousands of symbols
    downstream.  Step-function audio with rare huge jumps produces
    exactly these quotient-~123 codes at k=6 (found by randomized
    fuzzing)."""
    import io

    from flac_codec_tpu.decode import FlacSampleReader
    from flac_codec_tpu.encode import FlacSampleWriter, Options

    rng = np.random.default_rng(1)
    bps, ch, block, n = 12, 2, 4096, 11594
    total = n * ch
    hi = (1 << (bps - 1)) - 1
    reps = np.repeat(rng.integers(-hi - 1, hi + 1, total // 50 + 1), 50)
    pcm = np.asarray(reps[:total], dtype=np.int64)
    opts = (Options().with_block_size(block).no_seektable()
            .with_max_lpc_order(None).with_max_partition_order(0)
            .with_mid_side(True))
    buf = io.BytesIO()
    w = FlacSampleWriter(buf, opts, 44100, bps, ch, total_samples=n)
    w.write(pcm)
    w.finalize()
    data = buf.getvalue()
    # decoder path (delegates to the native bulk decoder when available)
    got = np.asarray(FlacSampleReader(io.BytesIO(data)).read_to_end())
    np.testing.assert_array_equal(got, pcm)
    # explicit native single-thread and speculative multi-thread paths
    nat = native.load()
    if nat is not None:
        from flac_codec_tpu.decode import Decoder

        for nthreads in (1, 4):
            d = Decoder(io.BytesIO(data))
            out, sizes, end, err = nat.decode_frames(
                d.r.np_view(), d.r.pos, 10 ** 6, 44100, ch, bps, block, n,
                nthreads=nthreads)
            np.testing.assert_array_equal(out[: n * ch], pcm)
