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
