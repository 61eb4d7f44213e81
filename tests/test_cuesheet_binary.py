"""Strict CUESHEET binary validation + track_byte_ranges (VERDICT r1
item 4; reference typestate rules: src/metadata/mod.rs:3416-3475,
src/metadata/cuesheet.rs:1-833, byte ranges: mod.rs:3390-3411).
"""

import numpy as np
import pytest

from flac_codec_tpu.errors import CuesheetError
from flac_codec_tpu.metadata.blocks import Cuesheet, CuesheetTrack


def _cdda(tracks=None, catalog=b"", lead_in=88200, lead_out_offset=5880):
    if tracks is None:
        tracks = [CuesheetTrack(offset=0, number=1, indices=[(0, 1)])]
    tracks = tracks + [CuesheetTrack(offset=lead_out_offset, number=170,
                                     indices=[])]
    return Cuesheet(catalog=catalog.ljust(128, b"\x00"), lead_in=lead_in,
                    is_cdda=True, tracks=tracks)


def _reparse(cs):
    return Cuesheet.from_bytes(cs.to_bytes())


def _expect(cs, variant):
    with pytest.raises(CuesheetError) as ei:
        _reparse(cs)
    assert ei.value.variant == variant, ei.value.variant


def test_valid_cdda_roundtrips():
    cs = _cdda(tracks=[
        CuesheetTrack(offset=0, number=1, isrc=b"USABC2400001",
                      indices=[(0, 1)]),
        CuesheetTrack(offset=588 * 4, number=2,
                      indices=[(0, 0), (588, 1), (1176, 2)])])
    got = _reparse(cs)
    assert len(got.tracks) == 3
    assert got.is_cdda


def test_no_tracks():
    cs = Cuesheet(catalog=b"\x00" * 128, is_cdda=True, tracks=[])
    _expect(cs, "NoTracks")


def test_cdda_too_many_tracks():
    tracks = [CuesheetTrack(offset=588 * i, number=i + 1, indices=[(0, 1)])
              for i in range(100)]
    tracks[0].offset = 0
    _expect(_cdda(tracks=tracks, lead_out_offset=588 * 200), "NoTracks")


def test_cdda_offset_not_588_multiple():
    _expect(_cdda(tracks=[
        CuesheetTrack(offset=0, number=1, indices=[(0, 1)]),
        CuesheetTrack(offset=589, number=2, indices=[(0, 1)])]),
        "InvalidCDDAOffset")


def test_cdda_index_offset_not_588_multiple():
    _expect(_cdda(tracks=[
        CuesheetTrack(offset=0, number=1, indices=[(0, 1), (100, 2)])]),
        "InvalidCDDAOffset")


def test_cdda_leadout_offset_not_588_multiple():
    _expect(_cdda(lead_out_offset=1000), "InvalidCDDAOffset")


def test_tracks_out_of_order():
    _expect(_cdda(tracks=[
        CuesheetTrack(offset=0, number=1, indices=[(0, 1)]),
        CuesheetTrack(offset=588, number=3, indices=[(0, 1)])]),
        "TracksOutOfSequence")


def test_first_track_must_be_number_one_at_offset_zero():
    _expect(_cdda(tracks=[
        CuesheetTrack(offset=588, number=1, indices=[(0, 1)])]),
        "TracksOutOfSequence")
    _expect(_cdda(tracks=[
        CuesheetTrack(offset=0, number=2, indices=[(0, 1)])]),
        "TracksOutOfSequence")


def test_zero_track_number():
    _expect(_cdda(tracks=[
        CuesheetTrack(offset=0, number=0, indices=[(0, 1)])]),
        "InvalidIndexPoint")


def test_no_index_points():
    _expect(_cdda(tracks=[CuesheetTrack(offset=0, number=1, indices=[])]),
            "NoIndexPoints")


def test_index_points_out_of_sequence():
    _expect(_cdda(tracks=[
        CuesheetTrack(offset=0, number=1, indices=[(0, 1), (588, 3)])]),
        "IndexPointsOutOfSequence")
    # first index must sit at relative offset 0
    _expect(_cdda(tracks=[
        CuesheetTrack(offset=0, number=1, indices=[(588, 1)])]),
        "IndexPointsOutOfSequence")
    # a 00 pre-gap must be followed by INDEX 01
    _expect(_cdda(tracks=[
        CuesheetTrack(offset=0, number=1, indices=[(0, 0), (588, 2)])]),
        "IndexPointsOutOfSequence")


def test_leadout_with_index_points():
    cs = _cdda()
    cs.tracks[-1].indices = [(0, 1)]
    _expect(cs, "IndexPointsInLeadout")


def test_leadout_wrong_number():
    cs = _cdda()
    cs.tracks[-1].number = 99
    _expect(cs, "TracksOutOfSequence")


def test_invalid_isrc():
    _expect(_cdda(tracks=[
        CuesheetTrack(offset=0, number=1, isrc=b"0012345678AB",
                      indices=[(0, 1)])]), "InvalidISRC")
    _expect(_cdda(tracks=[
        CuesheetTrack(offset=0, number=1, isrc=b"US-ABC-24-01",
                      indices=[(0, 1)])]), "InvalidISRC")


def test_cdda_catalog_must_be_13_digits():
    _expect(_cdda(catalog=b"12345"), "InvalidCatalogNumber")
    _expect(_cdda(catalog=b"123456789012X"), "InvalidCatalogNumber")
    got = _reparse(_cdda(catalog=b"1234567890123"))
    assert got.catalog.rstrip(b"\x00") == b"1234567890123"


def test_non_cdda_catalog_any_digit_length():
    cs = Cuesheet(catalog=b"987".ljust(128, b"\x00"), is_cdda=False, tracks=[
        CuesheetTrack(offset=0, number=1, indices=[(0, 1)]),
        CuesheetTrack(offset=1000, number=255, indices=[])])
    got = _reparse(cs)
    assert not got.is_cdda


def test_non_cdda_arbitrary_offsets_ok():
    cs = Cuesheet(catalog=b"\x00" * 128, is_cdda=False, tracks=[
        CuesheetTrack(offset=0, number=1, indices=[(0, 1), (123, 2)]),
        CuesheetTrack(offset=4567, number=2, indices=[(0, 1)]),
        CuesheetTrack(offset=9999, number=255, indices=[])])
    got = _reparse(cs)
    assert [t.offset for t in got.tracks] == [0, 4567, 9999]


def test_track_byte_ranges():
    cs = _cdda(tracks=[
        CuesheetTrack(offset=0, number=1, indices=[(0, 1)]),
        CuesheetTrack(offset=588 * 2, number=2, indices=[(0, 1)])],
        lead_out_offset=588 * 10)
    # CD-DA: 2 channels x 16 bits -> x4
    assert cs.track_byte_ranges(2, 16) == [
        (0, 588 * 2 * 4), (588 * 2 * 4, 588 * 10 * 4)]
    # ceil(20/8) = 3 bytes per sample
    assert cs.track_byte_ranges(1, 20) == [
        (0, 588 * 2 * 3), (588 * 2 * 3, 588 * 10 * 3)]
    with pytest.raises(ValueError):
        cs.track_byte_ranges(0, 16)


def test_flac_split_bytes_mode(tmp_path):
    """--bytes splitting produces the same PCM as sample splitting."""
    import io

    from flac_codec_tpu.cli import flac_split
    from flac_codec_tpu.decode import FlacSampleReader
    from flac_codec_tpu.encode import FlacSampleWriter, Options

    rng = np.random.default_rng(3)
    n = 588 * 20
    inter = rng.integers(-3000, 3000, 2 * n).astype(np.int32)
    cs = _cdda(tracks=[
        CuesheetTrack(offset=0, number=1, indices=[(0, 1)]),
        CuesheetTrack(offset=588 * 8, number=2, indices=[(0, 1)])],
        lead_out_offset=n)
    path = str(tmp_path / "in.flac")
    w = FlacSampleWriter(path, Options().cuesheet(cs), 44100, 16, 2,
                         total_samples=n)
    w.write(inter)
    w.finalize()
    out1 = tmp_path / "samples"
    out2 = tmp_path / "bytes"
    flac_split.main([path, "-d", str(out1), "-j", "1"])
    flac_split.main([path, "-d", str(out2), "-j", "1", "--bytes"])
    for name in ("track01.flac", "track02.flac"):
        a = FlacSampleReader(str(out1 / name)).read_to_end()
        b = FlacSampleReader(str(out2 / name)).read_to_end()
        np.testing.assert_array_equal(a, b)
    joined = np.concatenate([
        FlacSampleReader(str(out2 / "track01.flac")).read_to_end(),
        FlacSampleReader(str(out2 / "track02.flac")).read_to_end()])
    np.testing.assert_array_equal(joined, inter)
