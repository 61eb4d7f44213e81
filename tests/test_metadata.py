"""Metadata tests, modeled on the reference's tests/metadata.rs:
byte-for-byte roundtrip of fixture files, invariant enforcement, block list
ordering, and the in-place update machinery.
"""

import io
import shutil

import numpy as np
import pytest

from flac_codec_tpu import metadata as meta
from flac_codec_tpu.errors import (
    MissingStreaminfo,
    MultipleSeekTable,
    MultipleVorbisComment,
)

FIXTURES = ["sine.flac", "all-frames.flac", "comment.flac", "cuesheet.flac",
            "picture.flac", "seektable.flac"]


# -- byte-for-byte roundtrip (reference: tests/metadata.rs:12-35) -----------

@pytest.mark.parametrize("name", FIXTURES)
def test_metadata_byte_roundtrip(ref_data, name):
    raw = (ref_data / name).read_bytes()
    fp = io.BytesIO(raw)
    blocks = meta.read_blocks(fp)
    metadata_len = fp.tell()
    out = io.BytesIO()
    meta.write_blocks(out, blocks)
    assert out.getvalue() == raw[:metadata_len]


# -- invariants (reference: tests/metadata.rs:55-118) -----------------------

def _streaminfo():
    return meta.Streaminfo(minimum_block_size=4096, maximum_block_size=4096,
                           sample_rate=44100, channels=2, bits_per_sample=16)


def test_missing_streaminfo():
    fp = io.BytesIO(b"fLaC" + bytes([0x81, 0, 0, 4]) + b"\0\0\0\0")
    with pytest.raises(MissingStreaminfo):
        meta.read_blocks(fp)


def test_multiple_seektable_rejected():
    bl = meta.BlockList(_streaminfo())
    bl.blocks.append(meta.SeekTable([]))
    bl.blocks.append(meta.SeekTable([]))
    with pytest.raises(MultipleSeekTable):
        meta.write_blocks(io.BytesIO(), bl)


def test_multiple_comment_rejected():
    bl = meta.BlockList(_streaminfo())
    bl.blocks.append(meta.VorbisComment("v"))
    bl.blocks.append(meta.VorbisComment("w"))
    with pytest.raises(MultipleVorbisComment):
        meta.write_blocks(io.BytesIO(), bl)


# -- BlockList insert/replace ordering (reference: tests/metadata.rs:395) ---

def test_blocklist_insert_replace():
    bl = meta.BlockList(_streaminfo())
    bl.insert(meta.Padding(10))
    bl.insert(meta.Padding(20))  # paddings may repeat
    assert len(bl.get_all(meta.Padding)) == 2
    bl.insert(meta.VorbisComment("a"))
    bl.insert(meta.VorbisComment("b"))  # unique: replaced in place
    assert len(bl.get_all(meta.VorbisComment)) == 1
    assert bl.get(meta.VorbisComment).vendor == "b"


def test_vorbis_comment_field_access():
    vc = meta.VorbisComment("vendor")
    vc.insert("TITLE", "Song")
    vc.insert("title", "Song2")
    assert vc.get("Title") == "Song"
    assert vc.all("TITLE") == ["Song", "Song2"]
    vc.set("TITLE", "Only")
    assert vc.all("TITLE") == ["Only"]
    vc.remove("TITLE")
    assert vc.get("TITLE") is None


# -- update machinery (reference: src/metadata/mod.rs:978-1297) -------------

def test_update_in_place_with_padding(ref_data, tmp_path):
    src = tmp_path / "f.flac"
    shutil.copyfile(ref_data / "sine.flac", src)
    orig = src.read_bytes()

    meta.update(str(src), lambda bl: bl.update(
        meta.VorbisComment, lambda vc: vc.set("TITLE", "hello")))

    got = meta.read_block(str(src), meta.VorbisComment)
    assert got.get("TITLE") == "hello"
    # frames must be untouched
    from flac_codec_tpu.decode import verify, Verified
    assert verify(str(src)) == Verified.MD5_MATCH


def test_update_rebuild_when_too_big(ref_data, tmp_path):
    src = tmp_path / "f.flac"
    shutil.copyfile(ref_data / "sine.flac", src)

    big = "x" * 100000
    meta.update(str(src), lambda bl: bl.update(
        meta.VorbisComment, lambda vc: vc.set("BIG", big)))

    got = meta.read_block(str(src), meta.VorbisComment)
    assert got.get("BIG") == big
    from flac_codec_tpu.decode import verify, Verified
    assert verify(str(src)) == Verified.MD5_MATCH


# -- cuesheet binary + sample ranges ----------------------------------------

def test_cuesheet_fixture_ranges(ref_data):
    cs = meta.read_block(str(ref_data / "cuesheet.flac"), meta.Cuesheet)
    assert cs is not None
    ranges = cs.track_sample_ranges()
    assert len(ranges) >= 1
    # ranges ascend and are contiguous
    for (s0, e0), (s1, _) in zip(ranges, ranges[1:]):
        assert e0 == s1


def test_seektable_fixture(ref_data):
    st = meta.read_block(str(ref_data / "seektable.flac"), meta.SeekTable)
    assert st is not None and len(st.points) > 0
    offs = [p.sample_offset for p in st.points if not p.is_placeholder]
    assert offs == sorted(offs)


def test_vorbis_replace_with():
    """In-place value rewrite preserving order and key spelling
    (reference: src/metadata/mod.rs:2474-2488)."""
    from flac_codec_tpu.metadata import VorbisComment

    vc = VorbisComment("v", ["Title=abc", "ARTIST=x", "title=def", "A=B"])
    vc.replace_with("TITLE", str.upper)
    assert vc.fields == ["Title=ABC", "ARTIST=x", "title=DEF", "A=B"]
    import pytest

    with pytest.raises(ValueError):
        vc.replace_with("BAD=KEY", str.upper)


def test_seektable_max_points_on_read():
    import struct

    import pytest

    from flac_codec_tpu.errors import InvalidSeekTable
    from flac_codec_tpu.metadata import SeekTable

    assert SeekTable.MAX_POINTS == (1 << 24) // 18
    # construct an oversized table in memory (cheap: validate() directly)
    t = SeekTable([])
    t.points = [None] * (SeekTable.MAX_POINTS + 1)
    with pytest.raises(InvalidSeekTable):
        t._validate()
    # a small valid table still parses
    data = struct.pack(">QQH", 0, 0, 4096) + struct.pack(">QQH", 4096, 100, 4096)
    assert len(SeekTable.from_bytes(data).points) == 2


def test_cue_parse_cdda_lead_in_default():
    from flac_codec_tpu.metadata.cuesheet import parse_cuesheet

    cue = 'FILE "x.flac" FLAC\n  TRACK 01 AUDIO\n    INDEX 01 00:00:00\n'
    cs = parse_cuesheet(cue, lead_out_offset=588 * 100)
    assert cs.is_cdda and cs.lead_in == 88200
