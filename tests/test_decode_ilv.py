"""Single-thread interleaved decode (nat_decode_frames_ilv).

The lockstep pump decodes up to four speculatively-located frames at once
on one thread, feeding their Rice partitions to an interleaved 4-way
kernel.  It must be bit-identical to the pure sequential path in every
observable way — samples, block sizes, end position, error code — because
any speculation failure falls back to the sequential path inside C.
(Reference decode loop: src/decode.rs:1371-1460.)
"""

import io
import os

import numpy as np
import pytest

from flac_codec_tpu import native
from flac_codec_tpu.decode import Decoder
from flac_codec_tpu.encode import FlacSampleWriter, Options

nat = native.load()
pytestmark = pytest.mark.skipif(nat is None, reason="native engine needed")


def _encode(n_samples, seed=11, opts=None, bps=16, total=True, signal="noise"):
    rng = np.random.default_rng(seed)
    if signal == "noise":
        inter = rng.integers(-(1 << (bps - 2)), 1 << (bps - 2),
                             n_samples * 2).astype(np.int64)
    elif signal == "music":
        t = np.arange(n_samples, dtype=np.float64)
        base = 5000 * np.sin(t * 0.01) + 2500 * np.sin(t * 0.043)
        l = base + rng.normal(0, 200, n_samples)
        r = 0.8 * base + rng.normal(0, 200, n_samples)
        lim = (1 << (bps - 1)) - 1
        inter = np.clip(np.round(np.stack([l, r]).T.reshape(-1)),
                        -lim - 1, lim).astype(np.int64)
    elif signal == "steps":
        # step functions produce long unary runs -> over-long Rice codes
        # exercise the checked re-entry path inside the pump
        steps = rng.integers(-(1 << (bps - 2)), 1 << (bps - 2),
                             n_samples // 64 + 1)
        mono = np.repeat(steps, 64)[:n_samples]
        inter = np.stack([mono, -mono]).T.reshape(-1).astype(np.int64)
    else:  # silence tail: constant subframes (no-Rice frames in the pump)
        inter = np.zeros(n_samples * 2, dtype=np.int64)
        inter[: n_samples] = rng.integers(-1000, 1000, n_samples)
    buf = io.BytesIO()
    w = FlacSampleWriter(buf, opts or Options.fast(), 44100, bps, 2,
                         total_samples=n_samples if total else None)
    w.write(inter)
    w.finalize()
    return buf.getvalue()


def _bulk(data, remaining, ilv):
    d = Decoder(io.BytesIO(data))
    view, start = d.r.np_view(), d.r.pos
    max_block = d.streaminfo.maximum_block_size
    n_frames = 300_000 // max_block + 16
    if not ilv:
        os.environ["FLAC_TPU_NO_ILV"] = "1"
    try:
        return nat.decode_frames(view, start, n_frames, 44100, 2,
                                 d.streaminfo.bits_per_sample, max_block,
                                 remaining, nthreads=1)
    finally:
        os.environ.pop("FLAC_TPU_NO_ILV", None)


def _assert_same(data, remaining):
    out1, sizes1, end1, err1 = _bulk(data, remaining, ilv=False)
    out2, sizes2, end2, err2 = _bulk(data, remaining, ilv=True)
    assert (err1, end1) == (err2, end2)
    np.testing.assert_array_equal(sizes1, sizes2)
    np.testing.assert_array_equal(out1, out2)


@pytest.mark.parametrize("signal", ["noise", "music", "steps", "silence"])
@pytest.mark.parametrize("total", [True, False],
                         ids=["known-total", "unknown-total"])
def test_ilv_equals_sequential(signal, total):
    n = 150_000
    data = _encode(n, total=total, signal=signal)
    _assert_same(data, n if total else None)


@pytest.mark.parametrize("preset", ["fast", "best"])
def test_ilv_equals_sequential_24bit(preset):
    n = 120_000
    opts = Options.fast() if preset == "fast" else \
        Options.best().no_seektable()
    data = _encode(n, opts=opts, bps=24, signal="music")
    _assert_same(data, n)


def test_ilv_equals_sequential_32bit():
    # bps > 24 routes through the int64 FrameMachine/kernel instantiation
    n = 100_000
    data = _encode(n, bps=32, signal="music",
                   opts=Options.best().no_seektable())
    _assert_same(data, n)


def test_ilv_corruption_identical_error_surface():
    n = 150_000
    data = bytearray(_encode(n, signal="music"))
    rng = np.random.default_rng(5)
    for _ in range(12):
        corrupt = bytearray(data)
        pos = int(rng.integers(len(data) // 2, len(data) - 1))
        corrupt[pos] ^= 1 << int(rng.integers(8))
        _assert_same(bytes(corrupt), n)


def test_ilv_trailing_garbage():
    n = 150_000
    data = _encode(n) + b"\x55" * 1000
    _assert_same(data, None)


def test_ilv_tiny_buffer_falls_back():
    # below the pump's size gate: must still be exact (sequential inside)
    n = 3000
    data = _encode(n, signal="music")
    _assert_same(data, n)


def _raw(data, remaining, ilv):
    d = Decoder(io.BytesIO(data))
    view, start = d.r.np_view(), d.r.pos
    if not ilv:
        os.environ["FLAC_TPU_NO_ILV"] = "1"
    try:
        return nat.parse_frames_raw(view, start, 10 ** 6, 44100, 2,
                                    d.streaminfo.bits_per_sample,
                                    d.streaminfo.maximum_block_size,
                                    remaining)
    finally:
        os.environ.pop("FLAC_TPU_NO_ILV", None)


@pytest.mark.parametrize("signal", ["noise", "music", "steps", "silence"])
@pytest.mark.parametrize("bps", [16, 24])
def test_raw_parse_pump_equals_sequential(signal, bps):
    """The raw pump writes residual panels directly; every output field
    must match the sequential parser exactly."""
    n = 120_000
    data = _encode(n, bps=bps, signal=signal,
                   opts=Options.best().no_seektable())
    r1 = _raw(data, n, ilv=False)
    r2 = _raw(data, n, ilv=True)
    assert r1.keys() == r2.keys()
    for key in r1:
        if isinstance(r1[key], np.ndarray):
            np.testing.assert_array_equal(r1[key], r2[key], err_msg=key)
        else:
            assert r1[key] == r2[key], key


def test_raw_parse_pump_corruption_identical():
    n = 120_000
    data = bytearray(_encode(n, signal="music"))
    rng = np.random.default_rng(9)
    for _ in range(8):
        corrupt = bytearray(data)
        pos = int(rng.integers(len(data) // 2, len(data) - 1))
        corrupt[pos] ^= 1 << int(rng.integers(8))
        r1 = _raw(bytes(corrupt), n, ilv=False)
        r2 = _raw(bytes(corrupt), n, ilv=True)
        for key in r1:
            if isinstance(r1[key], np.ndarray):
                np.testing.assert_array_equal(r1[key], r2[key], err_msg=key)
            else:
                assert r1[key] == r2[key], key
