"""Tests for the previously-untested CLI paths (VERDICT r1 item 8):
flac-play --stdout PCM correctness, the flac-view-artwork PNG defilter
pipeline vs the reference image corpus (PIL as ground truth), and
Decoder.seek with no SEEKTABLE.
"""

import io
import struct
import zlib

import numpy as np
import pytest

from flac_codec_tpu.cli import flac_play, flac_view_artwork
from flac_codec_tpu.encode import FlacSampleWriter, Options


def _encode(tmp_path, n=5000, opts=None, name="a.flac"):
    rng = np.random.default_rng(17)
    inter = rng.integers(-20000, 20000, n * 2).astype(np.int32)
    path = str(tmp_path / name)
    w = FlacSampleWriter(path, opts or Options(block_size=1024),
                         44100, 16, 2, total_samples=n)
    w.write(inter)
    w.finalize()
    return path, inter


# ---------------------------------------------------------------------------
# flac-play --stdout
# ---------------------------------------------------------------------------

def test_flac_play_stdout_pcm(tmp_path, capsysbinary):
    path, inter = _encode(tmp_path)
    assert flac_play.main([path, "--stdout"]) == 0
    raw = capsysbinary.readouterr().out
    got = np.frombuffer(raw, dtype=np.float32)
    expected = inter.astype(np.float32) / 32768.0
    np.testing.assert_array_equal(got, expected)


# ---------------------------------------------------------------------------
# PNG defilter pipeline
# ---------------------------------------------------------------------------

def _make_png(pixels: np.ndarray, filters) -> bytes:
    """Encode an 8-bit RGB image applying the given per-row filter types
    (exercising every defilter branch in _decode_png)."""
    h, w, _ = pixels.shape
    stride = w * 3
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        line = pixels[y].reshape(-1).astype(np.int32)
        f = filters[y % len(filters)]
        raw.append(f)
        enc = np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            a = line[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            enc[i] = (line[i] - pred) & 0xFF
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]],
                         ids=["none", "sub", "up", "avg", "paeth", "mixed"])
def test_png_defilter_all_filter_types(filters):
    rng = np.random.default_rng(sum(filters) + 1)
    pixels = rng.integers(0, 256, (9, 7, 3)).astype(np.uint8)
    data = _make_png(pixels, filters)
    got = flac_view_artwork._decode_png(data)
    np.testing.assert_array_equal(got, pixels)


@pytest.mark.parametrize("name", ["basn0g08", "basn2c08", "basn3p08",
                                  "basn4a08", "basn6a08", "cdsn2c08"])
def test_png_corpus_vs_pil(ref_data, name):
    """8-bit images from the reference's PngSuite corpus decode exactly
    like PIL (PngSuite images are written with varied filters)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    path = ref_data / "images" / f"{name}.png"
    data = path.read_bytes()
    got = flac_view_artwork._decode_png(data)
    ref = PIL_Image.open(io.BytesIO(data))
    if ref.mode == "P":
        arr = np.array(ref.convert("RGB"))
    else:
        arr = np.array(ref)
        if arr.ndim == 2:  # grayscale
            arr = np.repeat(arr[:, :, None], 3, axis=2)
        elif arr.shape[2] == 2:  # gray + alpha: viewer repeats gray
            arr = np.repeat(arr[:, :, :1], 3, axis=2)
        elif arr.shape[2] == 4:  # RGBA: viewer drops alpha
            arr = arr[:, :, :3]
    np.testing.assert_array_equal(got, arr)


def test_png_unsupported_depth_raises(ref_data):
    from flac_codec_tpu.errors import FlacError

    data = (ref_data / "images" / "basn2c16.png").read_bytes()
    with pytest.raises(FlacError):
        flac_view_artwork._decode_png(data)


def test_view_artwork_cli_renders(tmp_path, capsys, ref_data):
    """End-to-end: embed a PNG cover and render it."""
    from flac_codec_tpu import metadata as meta
    from flac_codec_tpu.cli import flac_add_cover

    path, _ = _encode(tmp_path)
    png = str(ref_data / "images" / "basn2c08.png")
    assert flac_add_cover.main([path, png]) == 0
    assert flac_view_artwork.main([path, "--width", "16"]) == 0
    out = capsys.readouterr().out
    assert "\x1b[38;2;" in out and "▀" in out
    # --save extraction is byte-exact
    saved = tmp_path / "cover.png"
    assert flac_view_artwork.main([path, "--save", str(saved)]) == 0
    assert saved.read_bytes() == open(png, "rb").read()


# ---------------------------------------------------------------------------
# Decoder.seek without a SEEKTABLE (rewind fallback)
# ---------------------------------------------------------------------------

def test_seek_without_seektable(tmp_path):
    from flac_codec_tpu import metadata as meta
    from flac_codec_tpu.decode import FlacSampleReader

    n = 4096 * 3 + 500
    path, inter = _encode(tmp_path, n=n,
                          opts=Options(block_size=4096).no_seektable())
    blocks = meta.read_blocks(open(path, "rb"))
    assert blocks.get(meta.SeekTable) is None

    r = FlacSampleReader(path)
    target = 4096 * 2 + 123
    r.seek(target)
    got = r.read(1000)
    np.testing.assert_array_equal(
        got, inter[target * 2: target * 2 + 1000])
    # seeking backwards rewinds to the frames start and re-skips
    r.seek(10)
    got = r.read(50)
    np.testing.assert_array_equal(got, inter[20:70])
