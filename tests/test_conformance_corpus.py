"""Vendored decoder-conformance corpus (VERDICT r4 item 7).

tests/data/conformance/ holds pre-built binary FLAC streams frozen by
tools/make_conformance_corpus.py, covering the format features the IETF
decoder testbench exercises (reference claim: README.md:53-55; feature
semantics per src/stream.rs:84-1619, src/decode.rs:1494-1856).  Unlike
test_conformance.py (which builds streams at test time), these fixtures
are committed bytes: the decoder is tested against a frozen corpus, so a
decode regression cannot cancel against a generator regression.
"""

import hashlib
import io
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from flac_codec_tpu.decode import FlacSampleReader, Verified, verify

CORPUS = os.path.join(os.path.dirname(__file__), "data", "conformance")

with open(os.path.join(CORPUS, "manifest.json")) as _fp:
    MANIFEST = json.load(_fp)


def test_corpus_is_complete():
    files = sorted(f for f in os.listdir(CORPUS) if f.endswith(".flac"))
    assert files == sorted(MANIFEST), "corpus files and manifest disagree"
    assert len(files) >= 38


@pytest.mark.parametrize("name", sorted(MANIFEST))
def test_corpus_stream(name):
    with open(os.path.join(CORPUS, name), "rb") as fp:
        data = fp.read()
    rec = MANIFEST[name]
    assert len(data) == rec["bytes"]
    pcm = FlacSampleReader(io.BytesIO(data)).read_to_end()
    got = np.asarray(pcm, dtype=np.int64)
    assert len(got) == rec["total_samples"]
    assert hashlib.md5(got.astype("<i8").tobytes()).hexdigest() \
        == rec["pcm_md5"], name
    assert verify(io.BytesIO(data)) is Verified.MD5_MATCH


def test_corpus_through_device_batch_decoder():
    """The fixed-blocksize 16-bit fixtures also decode bit-exactly through
    the TPU BatchDecoder path."""
    from flac_codec_tpu.parallel.batch_decode import BatchDecoder

    ran = 0
    for name in ("decorrelate-mid-side.flac", "partition-order-6.flac",
                 "lpc-order-32.flac", "wasted-side-channel.flac"):
        with open(os.path.join(CORPUS, name), "rb") as fp:
            data = fp.read()
        dev = BatchDecoder(io.BytesIO(data), batch_frames=4).read_all_device()
        got = np.asarray(dev, dtype=np.int64).reshape(-1)
        assert hashlib.md5(got.astype("<i8").tobytes()).hexdigest() \
            == MANIFEST[name]["pcm_md5"], name
        ran += 1
    assert ran == 4
