"""Device frame-body parser (ops/framescan) differential tests.

Runs the Pallas kernel through the interpreter on the CPU backend and
compares against the native host raw parser on the same streams — the
same oracle relationship the TPU path relies on (reference semantics:
src/decode.rs:1635-1856).  Block sizes are kept small so the bit-serial
interpreter finishes quickly; every panel uses one shared width bucket so
the kernel compiles once.
"""

import io

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flac_codec_tpu import native
from flac_codec_tpu.bitio import BitReader
from flac_codec_tpu.decode import Decoder, FlacSampleReader
from flac_codec_tpu.encode import FlacSampleWriter, Options
from flac_codec_tpu.format import frame as fr
from flac_codec_tpu.format.analyze import FrameIterator
from flac_codec_tpu.ops import framescan

BS = 48           # small blocks: interpreter-friendly bit counts
W_BUCKET = 96     # shared word-panel width (one kernel compile)


def make_stream(opts, n, bps=16, seed=0, kind="music"):
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64)
    if kind == "music":
        base = 6000 * np.sin(t * 0.03) + 3000 * np.sin(t * 0.11)
        left = base + rng.normal(0, 300, n)
        right = 0.8 * base + rng.normal(0, 300, n)
    elif kind == "mixed":
        seg = (t // BS) % 3
        left = np.where(seg == 0, 0.0,
                        np.where(seg == 1, rng.integers(-50, 50, n),
                                 (1 << (bps - 2)) * np.sin(t * 0.9)))
        right = np.where((t // BS) % 2 == 0, left, 77.0)
        left = (left.astype(np.int64) << 2).astype(np.float64)
    else:
        left = rng.integers(-(1 << (bps - 1)), 1 << (bps - 1), n)
        right = rng.integers(-(1 << (bps - 1)), 1 << (bps - 1), n)
    lim = (1 << (bps - 1)) - 1
    pcm = np.stack([np.clip(left, -lim - 1, lim),
                    np.clip(right, -lim - 1, lim)],
                   axis=1).astype(np.int64).reshape(-1)
    buf = io.BytesIO()
    w = FlacSampleWriter(buf, opts, 44100, bps, 2, total_samples=n)
    w.write(pcm)
    w.finalize()
    return buf.getvalue()


def parse_on_device(stream, nat):
    dec = Decoder(io.BytesIO(stream))
    si = dec.streaminfo
    view = dec.r.np_view()
    scan = nat.scan_frames(view, dec.r.pos, 10 ** 6, si.sample_rate,
                           si.channels, si.bits_per_sample,
                           si.maximum_block_size, dec.total_samples)
    B = scan["n"]
    assert B > 0
    panel = np.zeros((framescan.LANES, W_BUCKET * 4), np.uint8)
    for f in range(B):
        o, nb = int(scan["body_off"][f]), int(scan["body_bytes"][f])
        assert nb <= W_BUCKET * 4
        panel[f, :nb] = view[o:o + nb]
    words = np.ascontiguousarray(panel.view(">u4").astype(np.uint32).T)
    nbits = np.zeros(framescan.LANES, np.int32)
    nbits[:B] = scan["body_bytes"].astype(np.int64) * 8
    assign = np.zeros(framescan.LANES, np.int32)
    assign[:B] = scan["assignment"]
    parsed = framescan.parse_frame_bodies(
        jnp.asarray(words), jnp.asarray(nbits), jnp.asarray(assign),
        si.maximum_block_size, si.channels, si.bits_per_sample,
        interpret=jax.default_backend() != "tpu")
    parsed = {k: np.asarray(v) for k, v in parsed.items()}
    raw = nat.parse_frames_raw(view, dec.r.pos, 10 ** 6, si.sample_rate,
                               si.channels, si.bits_per_sample,
                               si.maximum_block_size, dec.total_samples)
    assert raw["n"] == B
    return parsed, raw, B


@pytest.fixture(scope="module")
def nat():
    n = native.load()
    if n is None:
        pytest.skip("native engine unavailable")
    return n


@pytest.mark.parametrize("kind,bps,opts", [
    ("mixed", 16, Options.best()),       # wasted bits, constants, steps
    ("music", 24, Options.best()),       # rice2 / 5-bit methods
])
def test_device_parse_matches_host(nat, kind, bps, opts):
    stream = make_stream(opts.no_seektable().with_block_size(BS),
                         n=BS * 6, bps=bps, kind=kind)
    parsed, raw, B = parse_on_device(stream, nat)
    assert parsed["ok"][:B].all()
    for key in ("order", "shift", "wasted"):
        assert (parsed[key][:B] == raw[key].astype(np.int32)).all(), key
    assert (parsed["qcoeffs"][:B] == raw["qcoeffs"]).all()
    assert (parsed["buf"][:B] == raw["buf"]).all()


def test_scan_frames_boundaries(nat):
    """nat_scan_frames byte ranges agree with the format-layer parser."""
    stream = make_stream(Options.best().no_seektable().with_block_size(BS),
                         n=BS * 6 + 50, bps=16, kind="music")
    fp = io.BytesIO(stream)
    offsets = []
    for info, offset in FrameIterator(fp):
        r2 = BitReader(stream[offset:offset + info.byte_size])
        fr.FrameHeader.read(r2)
        offsets.append((offset + r2.abs_byte_pos, info.byte_size
                        - r2.abs_byte_pos - 2,
                        info.header.channel_assignment))
    dec = Decoder(io.BytesIO(stream))
    si = dec.streaminfo
    view = dec.r.np_view()
    scan = nat.scan_frames(view, dec.r.pos, 10 ** 6, si.sample_rate, 2, 16,
                           BS, dec.total_samples)
    assert scan["n"] == (BS * 6 + 50) // BS  # short tail stops the scan
    assert scan["error"] == 9  # DEC_SHORT_BLOCK
    for f in range(scan["n"]):
        o, nb, a = offsets[f]  # o is an absolute file offset; the scan's
        so = int(scan["body_off"][f])  # offsets are frame-region-relative
        assert int(scan["body_bytes"][f]) == nb
        assert view[so:so + nb].tobytes() == stream[o:o + nb]
        assert int(scan["assignment"][f]) == a


def test_batch_decoder_device_parse_end_to_end(nat, monkeypatch):
    """BatchDecoder with forced device parsing decodes bit-exactly."""
    from flac_codec_tpu.parallel.batch_decode import BatchDecoder

    monkeypatch.setenv("FLAC_TPU_PALLAS", "force")
    stream = make_stream(Options.best().no_seektable().with_block_size(BS),
                         n=BS * 6 + 50, bps=16, kind="music", seed=3)
    with BatchDecoder(io.BytesIO(stream), batch_frames=8,
                      device_parse=True) as bd:
        assert bd._device_parse
        got = np.asarray(bd.read_all_device())
    want = []
    with FlacSampleReader(io.BytesIO(stream)) as r:
        while True:
            chunk = r.read(65536)
            if not len(chunk):
                break
            want.append(chunk)
    want = np.concatenate(want).reshape(-1, 2)
    assert got.shape == want.shape
    assert (got == want).all()
