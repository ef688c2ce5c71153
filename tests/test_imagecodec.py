"""Pure-numpy PPM/BMP codecs + real decode through the multimodal ops."""

import numpy as np
import pytest

from ai_vector_database_converstion_from_pdf_spark.functions.imagecodec import (
    decode_bmp,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    nearest_resize,
)
from ai_vector_database_converstion_from_pdf_spark.operators.multimodal import (
    decode_image,
)


def _raster(h=5, w=7):
    rng = np.random.default_rng(42)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip():
    r = _raster()
    assert np.array_equal(decode_ppm(encode_ppm(r)), r)


def test_ppm_comments_and_whitespace():
    r = _raster(2, 2)
    body = encode_ppm(r).split(b"255\n", 1)[1]
    data = b"P6\n# a comment\n 2\t2 # trailing\n255\n" + body
    assert np.array_equal(decode_ppm(data), r)


def test_bmp_roundtrip_with_padding():
    # width 7 -> row 21 bytes -> padded to 24: exercises the pad path
    r = _raster(5, 7)
    assert np.array_equal(decode_bmp(encode_bmp(r)), r)


def test_bmp_known_pixels():
    # single red pixel, bottom-up bgr storage
    r = np.zeros((1, 1, 3), dtype=np.uint8)
    r[0, 0] = [255, 0, 0]
    data = encode_bmp(r)
    assert data[:2] == b"BM"
    got = decode_bmp(data)
    assert got[0, 0].tolist() == [255, 0, 0]


def test_decode_image_dispatch():
    r = _raster(3, 4)
    assert np.array_equal(decode_image(encode_ppm(r), "image/x-portable-pixmap"), r)
    assert np.array_equal(decode_image(encode_bmp(r), "image/bmp"), r)
    with pytest.raises((NotImplementedError, Exception)):
        decode_image(b"\x89PNG...", "image/png")


def test_nearest_resize_shape_and_corners():
    r = _raster(10, 20)
    s = nearest_resize(r, 5, 4)
    assert s.shape == (4, 5, 3)
    assert np.array_equal(s[0, 0], r[0, 0])
    assert np.array_equal(s[-1, -1], r[-1, -1])


def test_features_use_real_decode(spark):
    """Image mean_intensity must equal the numpy mean of the ACTUAL
    encoded raster — proving the pipeline decodes the real payload, not
    a payload-seeded fake."""
    from ai_vector_database_converstion_from_pdf_spark.operators.multimodal import (
        extract_features,
        synthetic_media,
    )

    media = synthetic_media(spark, n=12)
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    rows = media.filter("kind = 'image'").collect()
    assert rows
    for r in rows:
        raster = decode_image(bytes(r["payload"]), r["mime"])
        assert raster.shape == (r["height"], r["width"], 3)
        assert abs(feats[r["media_id"]]["mean_intensity"] - float(raster.mean())) < 1e-9
