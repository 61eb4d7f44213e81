"""Device decode pipeline (BatchDecoder) parity with the host decoder."""

import io

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from flac_codec_tpu.decode import FlacSampleReader
from flac_codec_tpu.encode import FlacSampleWriter, Options
from flac_codec_tpu.parallel.batch_decode import BatchDecoder


def test_fixture_parity(ref_data):
    path = str(ref_data / "sine.flac")
    host = FlacSampleReader(path).read_all()
    dev = np.asarray(BatchDecoder(path, batch_frames=16).read_all_device())
    np.testing.assert_array_equal(dev.reshape(-1), host)


@pytest.mark.parametrize("bps,channels", [(16, 2), (24, 2), (16, 1), (8, 4)])
def test_roundtrip_through_device_decode(bps, channels):
    rng = np.random.default_rng(bps * channels)
    bs = 512
    n = bs * 5 + 77  # ragged tail
    scale = 1 << (bps - 4)
    inter = rng.integers(-scale, scale, n * channels).astype(np.int32)
    buf = io.BytesIO()
    w = FlacSampleWriter(buf, Options(block_size=bs), 44100, bps, channels,
                         total_samples=n)
    w.write(inter)
    w.finalize()
    buf.seek(0)
    dev = np.asarray(BatchDecoder(buf, batch_frames=3).read_all_device())
    np.testing.assert_array_equal(dev.reshape(-1), inter)


def test_device_decode_sharded_mesh():
    """Same samples when the decode batch is sharded over the CPU mesh."""
    from flac_codec_tpu.parallel.mesh import batch_mesh

    rng = np.random.default_rng(33)
    bs = 512
    n = bs * 16
    inter = rng.integers(-3000, 3000, 2 * n).astype(np.int32)
    buf = io.BytesIO()
    w = FlacSampleWriter(buf, Options(block_size=bs), 44100, 16, 2,
                         total_samples=n)
    w.write(inter)
    w.finalize()
    buf.seek(0)
    mesh = batch_mesh(jax.devices("cpu"))
    dev = np.asarray(BatchDecoder(buf, batch_frames=16,
                                  mesh=mesh).read_all_device())
    np.testing.assert_array_equal(dev.reshape(-1), inter)


def test_fixed_only_stream_cumsum_dispatch():
    """A no-LPC stream (Options.fast-style) decodes via the all-FIXED
    cumsum path; PCM identical to the host decoder."""
    rng = np.random.default_rng(42)
    bs = 1024
    n = bs * 6 + 100
    # smooth signal so fixed predictors genuinely engage (orders 1-4)
    sig = np.cumsum(rng.integers(-60, 60, n)).astype(np.int32)
    sig2 = np.cumsum(rng.integers(-60, 60, n)).astype(np.int32)
    inter = np.stack([sig, sig2]).T.reshape(-1)
    buf = io.BytesIO()
    w = FlacSampleWriter(buf, Options(block_size=bs, max_lpc_order=None),
                         44100, 16, 2, total_samples=n)
    w.write(inter)
    w.finalize()
    host = FlacSampleReader(io.BytesIO(buf.getvalue())).read_all()

    # the dispatch must actually choose the cumsum mode for this stream
    from flac_codec_tpu.parallel import batch_decode as bd

    seen = []
    orig = bd._device_reconstruct

    def spy(*args, **kw):
        seen.append(kw.get("mode"))
        return orig(*args, **kw)

    buf.seek(0)
    bd._device_reconstruct, saved = spy, orig
    try:
        dev = np.asarray(BatchDecoder(buf, batch_frames=4).read_all_device())
    finally:
        bd._device_reconstruct = saved
    np.testing.assert_array_equal(dev.reshape(-1), host)
    assert "fixed" in seen, f"cumsum dispatch never engaged: {seen}"


def test_batch_decoder_pallas_interpret_integration(monkeypatch):
    """End-to-end BatchDecoder through the Pallas path (interpret mode on
    CPU via FLAC_TPU_PALLAS=force): gate selection, limb-mode dispatch,
    wasted-bits and decorrelation must match the host decoder exactly."""
    import io

    from flac_codec_tpu.decode import FlacSampleReader
    from flac_codec_tpu.encode import FlacSampleWriter, Options
    import flac_codec_tpu.parallel.batch_decode as bdm

    rng = np.random.default_rng(17)
    n = 256 * 6
    t = np.arange(n, dtype=np.float64)
    sig = 5000 * np.sin(t * 0.02) + rng.normal(0, 400, n)
    pcm = np.clip(np.round(np.stack([sig, 0.7 * sig]).T.reshape(-1)),
                  -32768, 32767).astype(np.int32)
    buf = io.BytesIO()
    opts = Options.best().with_block_size(256).no_seektable()
    w = FlacSampleWriter(buf, opts, 44100, 16, 2, total_samples=n)
    w.write(pcm)
    w.finalize()

    monkeypatch.setenv("FLAC_TPU_PALLAS", "force")
    modes = []
    orig = bdm._device_reconstruct

    def spy(*a, **kw):
        modes.append(kw.get("mode"))
        return orig(*a, **kw)

    monkeypatch.setattr(bdm, "_device_reconstruct", spy)
    with bdm.BatchDecoder(io.BytesIO(buf.getvalue()), batch_frames=6) as bd:
        out = bd.read_all_device()
    assert "pallas" in modes, f"pallas path not engaged: {modes}"
    ref = np.asarray(
        FlacSampleReader(io.BytesIO(buf.getvalue())).read_to_end())
    got = np.asarray(out).reshape(-1)[: len(ref)]
    np.testing.assert_array_equal(ref, got)


def test_batch_decoder_32bit_pallas_4limb(monkeypatch):
    """32-bit-wide independent-channel streams ride the 4-limb Pallas
    mode bit-exactly (VERDICT r2 item 6)."""
    import os

    monkeypatch.setenv("FLAC_TPU_PALLAS", "force")
    rng = np.random.default_rng(9)
    n = 256 * 4
    sig = np.cumsum(rng.integers(-(1 << 24), 1 << 24, 2 * n)) \
        .astype(np.int64)
    lim = (1 << 31) - 1
    inter = np.clip(sig, -lim - 1, lim).astype(np.int64)
    buf = io.BytesIO()
    opts = Options().with_block_size(256).no_seektable()
    w = FlacSampleWriter(buf, opts, 44100, 32, 2, total_samples=n)
    w.write(inter)
    w.finalize()
    with BatchDecoder(io.BytesIO(buf.getvalue()), batch_frames=4) as bd:
        got = np.asarray(bd.read_all_device())
    want = []
    with FlacSampleReader(io.BytesIO(buf.getvalue())) as r:
        while True:
            chunk = r.read(65536)
            if not len(chunk):
                break
            want.append(chunk)
    want = np.concatenate(want).reshape(-1, 2)
    assert (got == want).all()


def test_batch_decoder_variable_blocksize_batch_mode():
    """Variable-block streams decode in BATCH mode (one native bulk call
    per batch), not frame-at-a-time (VERDICT r2 item 5)."""
    from flac_codec_tpu.format.genstream import (FrameSpec, SubframeSpec,
                                                 build_stream)

    rng = np.random.default_rng(5)
    frames = []
    for bs in (192, 576, 256, 1024, 192, 320):
        subs = [SubframeSpec(type="verbatim",
                             values=rng.integers(-5000, 5000, bs))
                for _ in range(2)]
        frames.append(FrameSpec(block_size=bs, subframes=subs))
    stream, pcm = build_stream(frames, sample_rate=44100, bps=16,
                               variable=True)
    with BatchDecoder(io.BytesIO(stream), batch_frames=4) as bd:
        assert not bd._native_ok           # irregular stream
        got = np.asarray(bd.read_all_device())
    np.testing.assert_array_equal(got.reshape(-1), pcm)


def test_batch_decoder_reference_fixtures(ref_data):
    """Every reference binary fixture decodes identically through the
    BatchDecoder and the sample reader."""
    for path in sorted(ref_data.glob("*.flac")):
        data = path.read_bytes()
        want = []
        with FlacSampleReader(io.BytesIO(data)) as r:
            while True:
                chunk = r.read(1 << 16)
                if not len(chunk):
                    break
                want.append(chunk)
        want = np.concatenate(want) if want else np.empty(0, np.int32)
        with BatchDecoder(io.BytesIO(data), batch_frames=8) as bd:
            got = np.asarray(bd.read_all_device()).reshape(-1)
        np.testing.assert_array_equal(got, want, err_msg=path.name)
