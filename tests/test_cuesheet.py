"""Cuesheet text parsing vs the reference's OK/BAD .cue fixture corpus
(modeled on the reference's tests/metadata.rs:120-393)."""

import glob

import pytest

from flac_codec_tpu.errors import CuesheetError
from flac_codec_tpu.metadata.cuesheet import parse_cuesheet, render_cuesheet


def _fixtures(ref_data, pattern):
    files = sorted((ref_data / "cuesheets").glob(pattern))
    if not files:
        pytest.skip("no cuesheet fixtures")
    return files


def test_ok_corpus(ref_data):
    for f in _fixtures(ref_data, "OK-*.cue"):
        cs = parse_cuesheet(f.read_text())
        assert cs.tracks, f.name
        # binary roundtrip
        from flac_codec_tpu.metadata import Cuesheet

        assert Cuesheet.from_bytes(cs.to_bytes()).to_bytes() == cs.to_bytes()


def test_bad_corpus_rejected(ref_data):
    for f in _fixtures(ref_data, "BAD-*.cue"):
        with pytest.raises(CuesheetError):
            parse_cuesheet(f.read_text())


def test_bad_corpus_variants(ref_data):
    """The error variant must match the fixture's name."""
    for f in _fixtures(ref_data, "BAD-*.cue"):
        expected = f.stem[4:].rstrip("-0123456789")
        with pytest.raises(CuesheetError) as exc:
            parse_cuesheet(f.read_text())
        assert exc.value.variant == expected, f.name


def test_render_parse_roundtrip(ref_data):
    for f in _fixtures(ref_data, "OK-0.cue"):
        cs = parse_cuesheet(f.read_text())
        text = render_cuesheet(cs)
        cs2 = parse_cuesheet(text)
        assert [t.offset for t in cs2.tracks if t.number < 100] == \
            [t.offset for t in cs.tracks if t.number < 100]
