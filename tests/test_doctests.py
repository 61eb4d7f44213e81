"""Run the API docstring examples (SURVEY §4 Tier 2 — the reference
documents nearly every public item with a runnable roundtrip example;
these are ours, executed as part of the suite)."""

import doctest

import flac_codec_tpu.decode
import flac_codec_tpu.encode
import flac_codec_tpu.metadata


def test_encode_doctests():
    r = doctest.testmod(flac_codec_tpu.encode, verbose=False)
    assert r.attempted >= 12 and r.failed == 0, r


def test_decode_doctests():
    r = doctest.testmod(flac_codec_tpu.decode, verbose=False)
    assert r.attempted >= 10 and r.failed == 0, r


def test_metadata_doctests():
    r = doctest.testmod(flac_codec_tpu.metadata, verbose=False)
    assert r.attempted >= 5 and r.failed == 0, r
