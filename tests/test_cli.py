"""CLI tool smoke tests (reference: examples/*.rs behaviors)."""

import io
import os
import shutil
import struct
import sys

import numpy as np
import pytest

from flac_codec_tpu.cli import (
    flac2wav,
    flac_add_cover,
    flac_analyze,
    flac_cat,
    flac_export_cuesheet,
    flac_import_cuesheet,
    flac_info,
    flac_resample,
    flac_tag,
    flac_verify,
    wav2flac,
)
from flac_codec_tpu.decode import Verified, verify
from flac_codec_tpu.utils.wav import (
    WaveSpec,
    pcm_to_wave_bytes,
    read_wave_data,
    read_wave_header,
    write_wave,
)


def make_wav(path, n=30000, channels=2, bps=16, rate=44100):
    rng = np.random.default_rng(1)
    t = np.arange(n)
    chans = [(3000 * np.sin(t * 0.01 * (c + 1))
              + rng.integers(-100, 100, n)).astype(np.int32)
             for c in range(channels)]
    inter = np.stack(chans).T.reshape(-1)
    with open(path, "wb") as fp:
        write_wave(fp, rate, channels, bps, n)
        fp.write(pcm_to_wave_bytes(inter, bps))
    return inter


def test_wav_roundtrip_cli(tmp_path):
    wav = str(tmp_path / "in.wav")
    flac = str(tmp_path / "out.flac")
    wav2 = str(tmp_path / "back.wav")
    original = make_wav(wav)

    assert wav2flac.main([wav, flac]) == 0
    assert verify(flac) == Verified.MD5_MATCH
    assert flac2wav.main([flac, "-o", wav2]) == 0

    with open(wav2, "rb") as fp:
        spec = read_wave_header(fp)
        assert (spec.sample_rate, spec.channels, spec.bits_per_sample) == \
            (44100, 2, 16)
        got = np.concatenate(list(read_wave_data(fp, spec)))
    np.testing.assert_array_equal(got, original)


def test_wav_8bit_unsigned_shim(tmp_path):
    wav = str(tmp_path / "in8.wav")
    flac = str(tmp_path / "out8.flac")
    n = 5000
    rng = np.random.default_rng(2)
    inter = rng.integers(-128, 128, n).astype(np.int32)
    with open(wav, "wb") as fp:
        write_wave(fp, 8000, 1, 8, n)
        fp.write(pcm_to_wave_bytes(inter, 8))
    assert wav2flac.main([wav, flac]) == 0
    assert verify(flac) == Verified.MD5_MATCH


def test_flac_info_and_analyze(ref_data, capsys):
    path = str(ref_data / "sine.flac")
    assert flac_info.main([path]) == 0
    out = capsys.readouterr().out
    assert "STREAMINFO" in out and "sample_rate: 44100" in out

    assert flac_analyze.main([path]) == 0
    out = capsys.readouterr().out
    assert "frame=0" in out and "subframe=" in out


def test_flac_verify_cli(ref_data, capsys):
    assert flac_verify.main([str(ref_data / "sine.flac")]) == 0
    assert "md5-match" in capsys.readouterr().out


def test_flac_tag_and_cover(ref_data, tmp_path):
    f = str(tmp_path / "t.flac")
    shutil.copyfile(ref_data / "sine.flac", f)
    assert flac_tag.main([f, "TITLE=Test Song", "ARTIST=Nobody"]) == 0
    from flac_codec_tpu import metadata as meta

    vc = meta.read_block(f, meta.VorbisComment)
    assert vc.get("TITLE") == "Test Song"
    assert vc.get("ARTIST") == "Nobody"

    pngs = sorted((ref_data / "images").glob("basn*.png"))
    if pngs:
        assert flac_add_cover.main([f, str(pngs[0])]) == 0
        pic = meta.read_block(f, meta.Picture)
        assert pic is not None and pic.width == 32
    assert verify(f) == Verified.MD5_MATCH


def test_flac_cat(ref_data, tmp_path):
    out = str(tmp_path / "cat.flac")
    src = str(ref_data / "sine.flac")
    assert flac_cat.main([src, src, "-o", out]) == 0
    from flac_codec_tpu import metadata as meta

    orig = meta.read_info(src)
    cat = meta.read_info(out)
    assert cat.total_samples == 2 * orig.total_samples
    assert verify(out) == Verified.MD5_MATCH


def test_cuesheet_import_export(ref_data, tmp_path, capsys):
    f = str(tmp_path / "c.flac")
    shutil.copyfile(ref_data / "sine.flac", f)
    cue = tmp_path / "t.cue"
    cue.write_text('FILE "x.wav" WAVE\n  TRACK 01 AUDIO\n'
                   "    INDEX 01 00:00:00\n  TRACK 02 AUDIO\n"
                   "    INDEX 01 00:02:00\n")
    assert flac_import_cuesheet.main([f, str(cue)]) == 0
    assert flac_export_cuesheet.main([f]) == 0
    out = capsys.readouterr().out
    assert "TRACK 1 AUDIO" in out and "INDEX 01 00:00:00" in out
    assert verify(f) == Verified.MD5_MATCH


def test_flac_resample(ref_data, tmp_path):
    out = str(tmp_path / "rs.flac")
    assert flac_resample.main([str(ref_data / "sine.flac"), out, "22050"]) == 0
    from flac_codec_tpu import metadata as meta

    si = meta.read_info(out)
    assert si.sample_rate == 22050
    assert verify(out) == Verified.MD5_MATCH


def test_wav_valid_bits_in_wider_container(tmp_path):
    """24 valid bits in 32-bit containers (common DAW output) and 20-bit
    MSB-justified layouts must read back the true sample values."""
    import struct

    import numpy as np

    from flac_codec_tpu.utils.wav import (read_wave_data, read_wave_header,
                                          write_wave, pcm_to_wave_bytes,
                                          WaveSpec, _PCM_GUID,
                                          WAVE_FORMAT_EXTENSIBLE)

    rng = np.random.default_rng(0)
    vals = rng.integers(-(1 << 23), 1 << 23, 64).astype(np.int64)

    # hand-build a 24-in-32 extensible WAV
    container_bytes = b"".join(
        struct.pack("<i", int(v) << 8) for v in vals)  # MSB-justified
    fmt = struct.pack("<HHIIHH", WAVE_FORMAT_EXTENSIBLE, 1, 48000,
                      48000 * 4, 4, 32)
    fmt += struct.pack("<HHI", 22, 24, 0x4) + _PCM_GUID
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8
                                 + len(container_bytes)) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(container_bytes))
           + container_bytes)
    import io
    fp = io.BytesIO(wav)
    spec = read_wave_header(fp)
    assert spec.bits_per_sample == 24 and spec.container_bits == 32
    got = np.concatenate(list(read_wave_data(fp, spec)))
    np.testing.assert_array_equal(got, vals)

    # 20-bit write/read roundtrip through our own writer (MSB-justified
    # in 24-bit containers)
    vals20 = rng.integers(-(1 << 19), 1 << 19, 48).astype(np.int64)
    buf = io.BytesIO()
    write_wave(buf, 44100, 1, 20, len(vals20))
    buf.write(pcm_to_wave_bytes(vals20, 20))
    buf.seek(0)
    spec = read_wave_header(buf)
    assert spec.bits_per_sample == 20 and spec.container_bits == 24
    got = np.concatenate(list(read_wave_data(buf, spec)))
    np.testing.assert_array_equal(got, vals20)


def test_cli_clean_error_on_missing_file(capsys, tmp_path):
    """Expected failures print one diagnostic line + exit 1, no traceback
    (dispatcher-level contract shared by all 14 tools)."""
    from flac_codec_tpu import cli as cli_mod

    missing = str(tmp_path / "nope.flac")
    for tool in ("flac-verify", "flac-info", "flac-analyze", "flac2wav"):
        rc = cli_mod.main([tool, missing])
        captured = capsys.readouterr()
        assert rc == 1, tool
        text = captured.err + captured.out
        assert "Traceback" not in text, tool
        assert "nope.flac" in text, tool
