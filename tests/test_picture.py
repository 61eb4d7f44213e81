"""Picture metric sniffing vs the reference's image corpus
(modeled on the reference's tests/picture.rs).
"""

import pytest

from flac_codec_tpu.metadata.picture import sniff_metrics
from flac_codec_tpu.metadata import Picture
from flac_codec_tpu import metadata as meta


def test_png_corpus(ref_data):
    images = sorted((ref_data / "images").glob("*.png"))
    if not images:
        pytest.skip("no PNG fixtures")
    for p in images:
        mime, w, h, depth, colors = sniff_metrics(p.read_bytes())
        assert mime == "image/png"
        assert w > 0 and h > 0 and depth > 0
        if p.name.startswith("basn"):
            # PngSuite basn images are 32x32
            assert w == 32 and h == 32


def test_jpeg_gif(ref_data):
    jpgs = list((ref_data / "images").glob("*.jpg")) + \
        list((ref_data / "images").glob("*.jpeg"))
    for p in jpgs:
        mime, w, h, depth, colors = sniff_metrics(p.read_bytes())
        assert mime == "image/jpeg" and w > 0 and h > 0
    gifs = list((ref_data / "images").glob("*.gif"))
    for p in gifs:
        mime, w, h, depth, colors = sniff_metrics(p.read_bytes())
        assert mime == "image/gif" and w > 0 and h > 0


def test_picture_block_roundtrip(ref_data):
    pngs = sorted((ref_data / "images").glob("*.png"))
    if not pngs:
        pytest.skip("no PNG fixtures")
    pic = Picture.new(Picture.FRONT_COVER, "cover", pngs[0].read_bytes())
    blob = pic.to_bytes()
    back = Picture.from_bytes(blob)
    assert back == pic


def test_picture_fixture(ref_data):
    pic = meta.read_block(str(ref_data / "picture.flac"), meta.Picture)
    assert pic is not None
    assert pic.width > 0 and pic.height > 0


def test_picture_type_constants_and_names():
    # all 21 defined type codes (reference: src/metadata/mod.rs:4035-4078)
    assert Picture.OTHER == 0 and Picture.PUBLISHER_LOGO == 20
    assert len(Picture.TYPE_NAMES) == 21
    assert Picture(picture_type=Picture.FISH).type_name() == \
        "A Bright Colored Fish"
    assert Picture(picture_type=3).type_name() == "Cover (front)"


def test_picture_type_range_validated():
    # parse must reject type codes past PublisherLogo
    # (reference: src/metadata/mod.rs:4108-4137 -> Error::InvalidPictureType)
    from flac_codec_tpu.errors import InvalidPictureType

    blob = Picture(picture_type=20).to_bytes()
    bad = (21).to_bytes(4, "big") + blob[4:]
    with pytest.raises(InvalidPictureType):
        Picture.from_bytes(bad)
    with pytest.raises(InvalidPictureType):
        Picture(picture_type=21)
    with pytest.raises(InvalidPictureType):
        Picture(picture_type=-1)
