"""Writer context-manager error paths.

The reference finalizes on Drop so an interrupted encode still leaves a
valid file (src/encode.rs:399-405, 2113-2117) — and the in-flight panic
(exception) is never masked.  These tests pin both properties for every
writer surface; they fail on the round-1 code (FlacByteWriter.__exit__
raised AttributeError on the error path, BatchEncoder leaked its fd).
"""

import io
import os

import numpy as np
import pytest

from flac_codec_tpu.encode import (FlacByteWriter, FlacChannelWriter,
                                   FlacSampleWriter, Options)
from flac_codec_tpu.decode import FlacSampleReader, Verified, verify
from flac_codec_tpu.parallel.batch import BatchEncoder


class Boom(RuntimeError):
    pass


def _samples(n=5000):
    rng = np.random.default_rng(99)
    return rng.integers(-2000, 2000, n).astype(np.int32)


def _assert_valid_flac(path, expect_samples):
    assert verify(path) is Verified.MD5_MATCH
    with open(path, "rb") as fp:
        r = FlacSampleReader(fp)
        got = r.read_to_end()
        assert len(got) == expect_samples


WRITERS = []


def _register(fn):
    WRITERS.append(fn)
    return fn


@_register
def _sample_writer(target, opts):
    w = FlacSampleWriter(target, opts, 44100, 16, 2)
    return w, lambda data: w.write(data)


@_register
def _channel_writer(target, opts):
    w = FlacChannelWriter(target, opts, 44100, 16, 2)
    return w, lambda data: w.write(
        [data[0::2].astype(np.int64), data[1::2].astype(np.int64)])


@_register
def _byte_writer(target, opts):
    w = FlacByteWriter(target, opts, 44100, 16, 2)
    return w, lambda data: w.write(
        data.astype("<i2").tobytes())


@_register
def _batch_encoder(target, opts):
    w = BatchEncoder(target, opts, 44100, 16, 2, batch_frames=2)
    return w, lambda data: w.write(data)


@pytest.mark.parametrize("make", WRITERS,
                         ids=["sample", "channel", "byte", "batch"])
def test_error_propagates_and_file_stays_valid(tmp_path, make):
    """Exception inside `with` propagates unchanged; file is finalized."""
    path = str(tmp_path / "out.flac")
    data = _samples(4096 * 2 + 1000)  # 2 whole frames + a partial tail
    with pytest.raises(Boom):
        w, write = make(path, Options(block_size=4096))
        with w:
            write(data)
            raise Boom("mid-encode failure")
    # finalize-on-Drop mirror: interrupted encode leaves a valid stream
    _assert_valid_flac(path, len(data))


@pytest.mark.parametrize("make", WRITERS,
                         ids=["sample", "channel", "byte", "batch"])
def test_owned_fd_closed_on_error(tmp_path, make):
    path = str(tmp_path / "out.flac")
    with pytest.raises(Boom):
        w, write = make(path, Options(block_size=4096))
        with w:
            write(_samples(8192 * 2))
            raise Boom()
    inner = getattr(w, "_inner", w)
    assert inner.encoder.fp.closed


@pytest.mark.parametrize("make", WRITERS,
                         ids=["sample", "channel", "byte", "batch"])
def test_error_with_caller_owned_fp(tmp_path, make):
    """Caller-provided streams are never closed by the writer."""
    buf = io.BytesIO()
    with pytest.raises(Boom):
        w, write = make(buf, Options(block_size=4096))
        with w:
            write(_samples(4096 * 2))
            raise Boom()
    assert not buf.closed
    # and the stream content is a valid finalized FLAC
    buf.seek(0)
    assert verify(buf) is Verified.MD5_MATCH


def test_byte_writer_error_with_partial_sample_bytes(tmp_path):
    """Trailing partial-sample bytes must not break the error path."""
    path = str(tmp_path / "out.flac")
    data = _samples(4096 * 2)
    raw = data.astype("<i2").tobytes() + b"\x01"  # odd byte: partial sample
    with pytest.raises(Boom):
        with FlacByteWriter(path, Options(block_size=4096),
                            44100, 16, 2) as w:
            w.write(raw)
            raise Boom()
    _assert_valid_flac(path, len(data))


def test_error_when_finalize_impossible_closes_fd(tmp_path):
    """If best-effort finalize itself fails (declared total mismatch),
    the fd is still closed and the original exception propagates."""
    path = str(tmp_path / "out.flac")
    with pytest.raises(Boom):
        w = FlacSampleWriter(path, Options(block_size=4096), 44100, 16, 2,
                             total_samples=10_000_000)
        with w:
            w.write(_samples(4096 * 2))
            raise Boom()
    assert w.encoder.fp.closed
    assert os.path.exists(path)


@pytest.mark.parametrize("make", WRITERS,
                         ids=["sample", "channel", "byte", "batch"])
def test_refuses_to_clobber_existing_file_by_default(tmp_path, make):
    """Path-opening writers must not overwrite an existing file unless
    Options.overwrite() was chosen (reference: src/encode.rs:1620-1631,
    1659-1672: create_new vs File::create)."""
    path = str(tmp_path / "exists.flac")
    with open(path, "wb") as fp:
        fp.write(b"precious")
    opts = Options().with_block_size(256).no_seektable()
    with pytest.raises(FileExistsError):
        make(path, opts)
    with open(path, "rb") as fp:
        assert fp.read() == b"precious"  # untouched

    # opt-out: Options.overwrite() clobbers
    w, write = make(path, opts.overwrite())
    data = _samples(512 * 2)
    write(data)
    w.finalize()
    _assert_valid_flac(path, len(data))

    # file objects are never gated (the caller already opened them)
    with open(path, "wb+") as fp:
        w, write = make(fp, opts)
        write(data)
        w.finalize()
