"""Structured frame model: parse -> rebuild must be byte-for-byte
(reference "Analyzes Files" round-trip claim, README.md:46-48;
Frame read/build pair src/stream.rs:1679-1928)."""

import io

import numpy as np
import pytest

from flac_codec_tpu.encode import FlacSampleWriter, Options
from flac_codec_tpu.format.frame_model import (iter_frame_data,
                                               parse_frame_data,
                                               rebuild_stream)


def _encode(pcm, opts, bps=16, ch=2, rate=44100):
    buf = io.BytesIO()
    w = FlacSampleWriter(buf, opts, rate, bps, ch,
                         total_samples=len(pcm) // ch)
    w.write(np.asarray(pcm, dtype=np.int64))
    w.finalize()
    return buf.getvalue()


def _music(n, seed=0, hi=20000):
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64)
    sig = 0.5 * hi * np.sin(t * 0.01) + rng.normal(0, hi / 50, n)
    return np.clip(np.round(sig), -hi, hi).astype(np.int64)


def test_rebuild_music_stream_byte_exact():
    n = 4096 * 3 + 777
    pcm = np.stack([_music(n, 1), _music(n, 2)]).T.reshape(-1)
    data = _encode(pcm, Options.best().no_seektable())
    assert rebuild_stream(io.BytesIO(data)) == data


def test_rebuild_covers_subframe_types():
    """Steps + silence + noise force constant/verbatim/fixed/LPC subframes
    and escape partitions through the model."""
    n = 4096 * 2
    rng = np.random.default_rng(3)
    steps = np.repeat(rng.integers(-30000, 30000, n // 25 + 1), 25)[:n]
    silent = np.zeros(n, dtype=np.int64)
    pcm = np.stack([steps, silent]).T.reshape(-1)
    data = _encode(pcm, Options.best().no_seektable())
    assert rebuild_stream(io.BytesIO(data)) == data
    kinds = set()
    for fd in iter_frame_data(io.BytesIO(data)):
        for sf in fd.subframes:
            kinds.add(sf.header.type)
    assert "constant" in kinds


@pytest.mark.parametrize("bps", [8, 16, 24, 32])
def test_rebuild_bit_depths(bps):
    hi = (1 << (bps - 1)) - 1
    n = 1152 * 2 + 93
    pcm = np.stack([_music(n, bps, hi=hi // 2),
                    _music(n, bps + 1, hi=hi // 2)]).T.reshape(-1)
    data = _encode(pcm, Options().with_block_size(1152).no_seektable(),
                   bps=bps)
    assert rebuild_stream(io.BytesIO(data)) == data


def test_rebuild_generated_streams():
    """Generator-built streams (variable blocksize, escape/constant
    partitions, wasted bits, rice2) round-trip byte-for-byte."""
    from flac_codec_tpu.format.genstream import (FrameSpec, SubframeSpec,
                                                 build_stream)

    rng = np.random.default_rng(11)

    def verb(n, bps=16, scale=None):
        scale = scale or (1 << (bps - 2))
        return SubframeSpec("verbatim", values=rng.integers(-scale, scale, n))

    def fixed(n, order, wasted=0, **kw):
        walk = np.cumsum(rng.integers(-200, 201, n)).astype(np.int64)
        x = np.clip(walk, -2000, 2000)
        res = x.copy()
        for _ in range(order):
            res = np.diff(res)
        return SubframeSpec("fixed", order=order, warmups=x[:order],
                            residuals=res, wasted=wasted, **kw)

    cases = []
    # variable blocksize
    cases.append(build_stream(
        [FrameSpec(576, [verb(576), verb(576)]),
         FrameSpec(192, [verb(192), verb(192)]),
         FrameSpec(1000, [verb(1000), verb(1000)])],
        variable=True))
    # wasted bits + constant
    cases.append(build_stream(
        [FrameSpec(256, [fixed(256, 2, wasted=3),
                         SubframeSpec("constant", values=np.array([77]))])]))
    # rice2 / 24-bit
    cases.append(build_stream(
        [FrameSpec(256, [verb(256, bps=24), verb(256, bps=24)])], bps=24))
    for data, pcm in cases:
        assert rebuild_stream(io.BytesIO(data)) == data


def test_frame_data_structure_contents():
    n = 4096
    pcm = np.stack([_music(n, 7), _music(n, 8)]).T.reshape(-1)
    data = _encode(pcm, Options.best().no_seektable())
    fds = list(iter_frame_data(io.BytesIO(data)))
    assert len(fds) == 1
    fd = fds[0]
    assert fd.header.block_size == n
    assert len(fd.subframes) == 2
    for sf in fd.subframes:
        if sf.header.type == "lpc":
            assert sf.coefficients is not None
            assert len(sf.coefficients) == sf.header.order
            assert sum(p.count or len(p.values) for p in sf.partitions) \
                == n - sf.header.order
