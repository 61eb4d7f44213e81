"""Seeking tests, modeled on the reference's tests/seek.rs: byte/sample
seeks over data/sine.flac from Start/Current/End plus invalid seeks.
"""

import hashlib
import io

import numpy as np
import pytest

from flac_codec_tpu.decode import FlacByteReader, FlacSampleReader
from flac_codec_tpu.errors import FlacError, InvalidSeek


def test_sample_seek_matches_full_read(ref_data):
    path = str(ref_data / "sine.flac")
    full = FlacSampleReader(path).read_all()
    r = FlacSampleReader(path)
    for target in [0, 1, 100, 44100, 99999, 150000]:
        r.seek(target)
        got = r.read(1000)
        ch = r.channels
        np.testing.assert_array_equal(
            got, full[target * ch:target * ch + 1000],
            err_msg=f"seek to {target}")


def test_byte_seek_start_current_end(ref_data):
    path = str(ref_data / "sine.flac")
    with open(path, "rb") as fp:
        full = FlacByteReader(fp).read()

    with open(path, "rb") as fp:
        r = FlacByteReader(fp)
        r.seek(1000)
        assert r.read(64) == full[1000:1064]
        # SEEK_CUR
        r.seek(100, io.SEEK_CUR)
        assert r.tell() == 1164
        assert r.read(64) == full[1164:1228]
        # SEEK_END
        r.seek(-64, io.SEEK_END)
        assert r.read(64) == full[-64:]


def test_md5_of_full_read_after_seek(ref_data):
    path = str(ref_data / "sine.flac")
    with open(path, "rb") as fp:
        r = FlacByteReader(fp)
        r.seek(12345)
        r.seek(0)
        data = r.read()
        assert hashlib.md5(data).digest() == r.streaminfo.md5


def test_invalid_seek(ref_data):
    path = str(ref_data / "sine.flac")
    with open(path, "rb") as fp:
        r = FlacByteReader(fp)
        with pytest.raises((InvalidSeek, FlacError)):
            r.seek(-1)
    r2 = FlacSampleReader(path)
    with pytest.raises(InvalidSeek):
        r2.seek(10**12)
