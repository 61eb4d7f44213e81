"""Format roundtrip tests, modeled on the reference's tests/format.rs
(SURVEY §4 tier 3): tiny files, block-size x LPC-order sweeps, fractional
last frames, the 36-way raw roundtrip matrix, full-scale squares, wasted
bits, sine suite, noise roundtrips at all presets.
"""

import io
import math

import numpy as np
import pytest

from flac_codec_tpu.decode import (
    Decoder,
    FlacByteReader,
    FlacChannelReader,
    FlacSampleReader,
    verify,
    Verified,
)
from flac_codec_tpu.encode import (
    FlacByteWriter,
    FlacChannelWriter,
    FlacSampleWriter,
    FlacStreamWriter,
    Options,
)
from flac_codec_tpu.decode import FlacStreamReader


def roundtrip_samples(samples, channels, bps, options=None, rate=44100):
    samples = np.asarray(samples)
    buf = io.BytesIO()
    w = FlacSampleWriter(buf, options or Options(), rate, bps, channels,
                         total_samples=len(samples) // channels)
    w.write(samples)
    w.finalize()
    buf.seek(0)
    out = FlacSampleReader(buf).read_all()
    np.testing.assert_array_equal(out, samples.astype(np.int32))
    buf.seek(0)
    assert verify(buf) == Verified.MD5_MATCH
    return buf


# -- tiny files (reference: tests/format.rs:16-82) --------------------------

@pytest.mark.parametrize("channels", [1, 2, 4, 8])
@pytest.mark.parametrize("bps", [8, 16, 24])
def test_tiny_one_sample_per_channel(channels, bps):
    samples = np.arange(channels) - channels // 2
    roundtrip_samples(samples, channels, bps)


# -- small blocks x lpc orders (reference: tests/format.rs:84-134) ----------

@pytest.mark.parametrize("block_size", list(range(16, 34)))
@pytest.mark.parametrize("lpc_order", [None, 1, 2, 8, 16, 32])
def test_small_blocks_lpc_orders(block_size, lpc_order):
    rng = np.random.default_rng(block_size)
    n = block_size * 3 + 7  # fractional last frame
    samples = rng.integers(-(1 << 12), 1 << 12, n)
    opts = Options(block_size=block_size, max_lpc_order=lpc_order)
    roundtrip_samples(samples, 1, 16, opts)


# -- fractional last frames around power-of-2 boundaries
#    (reference: tests/format.rs:136-205) -----------------------------------

@pytest.mark.parametrize("n", [255, 256, 257, 4095, 4096, 4097, 8191, 8193])
def test_fractional_tails(n):
    rng = np.random.default_rng(n)
    samples = rng.integers(-100, 100, n)
    roundtrip_samples(samples, 1, 16, Options(block_size=256))


# -- 36-way raw roundtrip matrix (reference: tests/format.rs:207-435) -------

@pytest.mark.parametrize("channels", [1, 2, 4, 8])
@pytest.mark.parametrize("bps", [8, 16, 24])
@pytest.mark.parametrize("length", [1, 111, 4777])
def test_roundtrip_matrix(ref_data, channels, bps, length):
    data = (ref_data / f"roundtrip-{channels}-{bps}-{length}.raw").read_bytes()
    buf = io.BytesIO()
    w = FlacByteWriter(buf, Options().no_padding(), 44100, bps, channels,
                       total_bytes=len(data))
    w.write(data)
    w.finalize()
    buf.seek(0)
    out = FlacByteReader(buf).read()
    assert out == data


# -- full-scale deflection squares (reference: tests/format.rs:437-621) -----

@pytest.mark.parametrize("bps", [8, 16, 24, 32])
def test_full_scale_deflection(bps):
    hi = (1 << (bps - 1)) - 1
    lo = -(1 << (bps - 1))
    pattern = np.tile(np.array([hi, lo, hi, lo, hi, hi, lo, lo]), 600)
    roundtrip_samples(pattern, 1, bps)


# -- wasted bits (reference: tests/format.rs:623-685) -----------------------

def test_wasted_bits(ref_data):
    data = (ref_data / "wasted-bits.raw").read_bytes()
    buf = io.BytesIO()
    w = FlacByteWriter(buf, Options().no_padding(), 44100, 16, 1,
                       total_bytes=len(data))
    w.write(data)
    w.finalize()
    buf.seek(0)
    assert FlacByteReader(buf).read() == data
    # ensure the first frame's subframe really records wasted bits
    buf.seek(0)
    dec = Decoder(buf)
    dec.r.discard_consumed()
    from flac_codec_tpu.format.frame import FrameHeader
    from flac_codec_tpu.format.subframe import read_subframe_header
    header = FrameHeader.read(dec.r, dec.streaminfo)
    sub = read_subframe_header(dec.r)
    assert sub.wasted_bps > 0


# -- sine suite (reference: tests/format.rs:687-1246, from libFLAC bench) ---

def generate_sine_1(full_scale, sample_rate, samples, f1, a1, f2, a2):
    delta1 = 2.0 * math.pi / (sample_rate / f1)
    delta2 = 2.0 * math.pi / (sample_rate / f2)
    theta = np.arange(samples)
    val = (a1 * np.sin(theta * delta1) + a2 * np.sin(theta * delta2)) * full_scale
    return val.astype(np.int64)


def generate_sine_2(full_scale, sample_rate, samples, f1, a1, f2, a2, fmult):
    delta1 = 2.0 * math.pi / (sample_rate / f1)
    delta2 = 2.0 * math.pi / (sample_rate / f2)
    theta = np.arange(samples)
    left = (a1 * np.sin(theta * delta1) + a2 * np.sin(theta * delta2)) * full_scale
    right = (a1 * np.sin(theta * delta1 * fmult)
             + a2 * np.sin(theta * delta2 * fmult)) * full_scale
    return np.stack([left.astype(np.int64), right.astype(np.int64)])


SINE_CASES_MONO = [
    (8, 48000.0, 200000, 441.0, 0.50, 441.0, 0.49),
    (16, 44100.0, 200000, 441.0, 0.61, 661.5, 0.37),
    (24, 44100.0, 200000, 441.0, 0.50, 882.0, 0.49),
    (32, 44100.0, 50000, 441.0, 0.50, 882.0, 0.49),
]


@pytest.mark.parametrize("bps,rate,n,f1,a1", [(c[0], c[1], c[2], c[3], c[4])
                                              for c in SINE_CASES_MONO])
def test_sine_mono(bps, rate, n, f1, a1):
    full_scale = (1 << (bps - 1)) - 1
    samples = generate_sine_1(full_scale, rate, min(n, 50000), f1, a1,
                              f1 * 1.5, 0.3)
    roundtrip_samples(samples, 1, bps, rate=int(rate))


@pytest.mark.parametrize("bps", [8, 16, 24])
def test_sine_stereo_channel_api(bps):
    full_scale = (1 << (bps - 1)) - 1
    chans = generate_sine_2(full_scale, 44100.0, 30000, 441.0, 0.50, 882.0,
                            0.49, 1.5)
    buf = io.BytesIO()
    w = FlacChannelWriter(buf, Options(), 44100, bps, 2,
                          total_samples=chans.shape[1])
    w.write(list(chans))
    w.finalize()
    buf.seek(0)
    out = FlacChannelReader(buf).read_all()
    np.testing.assert_array_equal(out, chans.astype(np.int32))
    buf.seek(0)
    assert verify(buf) == Verified.MD5_MATCH


# -- noise roundtrips at presets (reference: tests/format.rs:1248-1384) -----

@pytest.mark.parametrize("preset", ["default", "fast", "best"])
@pytest.mark.parametrize("channels,bps", [(1, 16), (2, 16), (2, 24), (8, 8)])
def test_noise_roundtrip_presets(ref_data, preset, channels, bps):
    raw = (ref_data / "noise.raw").read_bytes()[:120000]
    opts = {"default": Options(), "fast": Options.fast(),
            "best": Options.best()}[preset]
    buf = io.BytesIO()
    w = FlacByteWriter(buf, opts, 44100, bps, channels,
                       total_bytes=len(raw) - len(raw) % (channels * ((bps + 7) // 8)))
    usable = len(raw) - len(raw) % (channels * ((bps + 7) // 8))
    w.write(raw[:usable])
    w.finalize()
    buf.seek(0)
    assert FlacByteReader(buf).read() == raw[:usable]


@pytest.mark.parametrize("block_size", [32, 4096, 32768, 65535])
def test_noise_block_sizes(ref_data, block_size):
    raw = (ref_data / "noise.raw").read_bytes()[:100000]
    buf = io.BytesIO()
    w = FlacByteWriter(buf, Options(block_size=block_size), 44100, 16, 2,
                       total_bytes=len(raw))
    w.write(raw)
    w.finalize()
    buf.seek(0)
    assert FlacByteReader(buf).read() == raw


# -- 32 bps (no correlation path) -------------------------------------------

def test_32bps_stereo():
    rng = np.random.default_rng(5)
    n = 5000
    samples = rng.integers(-(1 << 31), (1 << 31) - 1, 2 * n)
    roundtrip_samples(samples, 2, 32)


# -- stream writer / reader (metadata-less) ---------------------------------

def test_stream_writer_reader():
    rng = np.random.default_rng(9)
    buf = io.BytesIO()
    w = FlacStreamWriter(buf)
    frames = [rng.integers(-1000, 1000, 2048 * 2) for _ in range(4)]
    for f in frames:
        w.write(f, 44100, 16, 2)
    buf.seek(0)
    r = FlacStreamReader(buf)
    for f in frames:
        got = r.read_frame()
        assert got is not None
        assert got.sample_rate == 44100
        assert got.channels == 2
        assert got.bits_per_sample == 16
        np.testing.assert_array_equal(got.samples, f.astype(np.int32))
    assert r.read_frame() is None


def test_stream_reader_resync():
    rng = np.random.default_rng(10)
    buf = io.BytesIO()
    w = FlacStreamWriter(buf)
    frame = rng.integers(-1000, 1000, 1024)
    buf.write(b"garbage prefix \xff\xfa junk")
    w.write(frame, 44100, 16, 1)
    buf.seek(0)
    r = FlacStreamReader(buf)
    got = r.read_frame()
    assert got is not None
    np.testing.assert_array_equal(got.samples, frame.astype(np.int32))
