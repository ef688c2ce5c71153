"""Perceptual-hash image dedup over the multimodal binary column."""

import numpy as np
from pyspark.sql import Row

from ai_vector_database_converstion_from_pdf_spark.functions.imagecodec import (
    encode_ppm,
)
from ai_vector_database_converstion_from_pdf_spark.operators.multimodal import (
    image_near_dup_pairs,
    perceptual_hashes,
)


def _img_row(media_id, raster):
    return Row(
        media_id=media_id,
        kind="image",
        mime="image/x-portable-pixmap",
        payload=bytearray(encode_ppm(raster)),
        width=raster.shape[1],
        height=raster.shape[0],
        duration_ms=None,
    )


def _gradient(seed, h=32, w=32):
    rng = np.random.RandomState(seed)
    base = np.linspace(0, 255, w, dtype=np.uint8)[None, :].repeat(h, axis=0)
    noise = rng.randint(0, 30, size=(h, w), dtype=np.uint8)
    return np.clip(base.astype(int) + noise, 0, 255).astype(np.uint8)[
        :, :, None
    ].repeat(3, axis=2)


def _media(spark, rows):
    return spark.createDataFrame(
        rows,
        "media_id long, kind string, mime string, payload binary, "
        "width int, height int, duration_ms long",
    )


class TestPerceptualHash:
    def test_identical_images_same_hash(self, spark):
        img = _gradient(1)
        df = _media(spark, [_img_row(1, img), _img_row(2, img)])
        h = {r.media_id: (r.ahash, r.dhash) for r in perceptual_hashes(df).collect()}
        assert h[1] == h[2]
        assert h[1][1] is not None

    def test_small_edit_small_hamming(self, spark):
        img = _gradient(2)
        edited = img.copy()
        edited[:4, :4] = 255  # small corner stamp
        noisy = np.clip(
            img.astype(int) + np.random.RandomState(0).randint(-6, 6, img.shape),
            0, 255,
        ).astype(np.uint8)
        other = _gradient(99)[:, ::-1]  # mirrored different image
        df = _media(
            spark,
            [_img_row(1, img), _img_row(2, edited), _img_row(3, noisy),
             _img_row(4, other)],
        )
        h = {r.media_id: r.dhash for r in perceptual_hashes(df).collect()}
        ham = lambda a, b: bin(a ^ b).count("1")
        assert ham(h[1], h[2]) <= 6
        assert ham(h[1], h[3]) <= 6
        assert ham(h[1], h[4]) > 10

    def test_near_dup_pairs_found_via_banding(self, spark):
        img = _gradient(3)
        edited = img.copy()
        edited[0, :] = 0
        rows = [_img_row(1, img), _img_row(2, edited)]
        rows += [_img_row(10 + i, _gradient(50 + i)) for i in range(6)]
        # a non-image row must be ignored, not crash the decode
        rows.append(
            Row(media_id=99, kind="audio", mime="audio/wav",
                payload=bytearray(b"RIFF"), width=None, height=None,
                duration_ms=100)
        )
        pairs = image_near_dup_pairs(_media(spark, rows), max_hamming=6).collect()
        found = {(p.id_a, p.id_b) for p in pairs}
        assert (1, 2) in found
        assert all({a, b} != {1, 99} and {a, b} != {2, 99} for a, b in found)

    def test_pigeonhole_guard(self, spark):
        import pytest

        df = _media(spark, [_img_row(1, _gradient(1))])
        with pytest.raises(ValueError):
            image_near_dup_pairs(df, max_hamming=7, band_bits=16)

    def test_layout_invariance(self, spark):
        rows = [_img_row(i, _gradient(i)) for i in range(12)]
        df = _media(spark, rows)
        a = sorted(map(tuple, perceptual_hashes(df).collect()))
        b = sorted(map(tuple, perceptual_hashes(df.repartition(5)).collect()))
        assert a == b
