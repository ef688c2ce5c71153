"""PVDV video container + frame-sampling operator: codec roundtrip,
seek-over-skipped-frames semantics, and the Spark row-expanding sampler
feeding the image feature stage unchanged."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _frames(n, w=8, h=6):
    out = []
    for j in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        out.append(
            np.stack(
                [
                    ((xx * 30 + j * 7) % 256).astype(np.uint8),
                    ((yy * 40) % 256).astype(np.uint8),
                    np.full((h, w), j, dtype=np.uint8),
                ],
                axis=2,
            )
        )
    return out


class TestVideoCodec:
    def test_roundtrip(self):
        from ai_vector_database_converstion_from_pdf_spark.functions.videocodec import (
            encode_video,
            iter_frames,
            video_info,
        )

        frames = _frames(5)
        blob = encode_video(frames, fps=2.5)
        n, fps = video_info(blob)
        assert n == 5 and fps == 2.5
        for i, raster in iter_frames(blob):
            assert np.array_equal(raster, frames[i])

    def test_sample_stride_and_equality(self):
        from ai_vector_database_converstion_from_pdf_spark.functions.imagecodec import (
            decode_ppm,
        )
        from ai_vector_database_converstion_from_pdf_spark.functions.videocodec import (
            encode_video,
            sample_frame_bytes,
        )

        frames = _frames(7)
        blob = encode_video(frames, fps=1.0)
        sampled = sample_frame_bytes(blob, 3)
        assert [i for i, _ in sampled] == [0, 3, 6]
        for i, b in sampled:
            assert np.array_equal(decode_ppm(b), frames[i])

    def test_bad_inputs(self):
        from ai_vector_database_converstion_from_pdf_spark.functions.videocodec import (
            encode_video,
            sample_frame_bytes,
            video_info,
        )

        with pytest.raises(ValueError):
            encode_video([])
        with pytest.raises(ValueError):
            video_info(b"nope-not-a-container")
        blob = encode_video(_frames(2))
        with pytest.raises(ValueError):
            sample_frame_bytes(blob, 0)


class TestSampleFramesOperator:
    def test_rows_and_features(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.functions.videocodec import (
            video_info,
        )
        from ai_vector_database_converstion_from_pdf_spark.operators.multimodal import (
            extract_features,
            sample_frames,
            synthetic_media,
        )

        media = synthetic_media(spark, n=24)
        vids = {
            r["media_id"]: bytes(r["payload"])
            for r in media.filter(F.col("kind") == "video").collect()
        }
        every = 2
        got = sample_frames(media, every_n=every).collect()
        by_vid = {}
        for r in got:
            by_vid.setdefault(r["media_id"], []).append(r)
        assert set(by_vid) == set(vids)
        for vid, rows in by_vid.items():
            n, _ = video_info(vids[vid])
            assert sorted(r["frame_idx"] for r in rows) == list(
                range(0, n, every)
            )
            assert all(r["mime"] == "image/x-portable-pixmap" for r in rows)

        # sampled frames feed the IMAGE feature stage unchanged: real
        # decode, real mean intensity
        feats = extract_features(
            sample_frames(media, every_n=every).select(
                "media_id", "kind", "mime", "payload", "width", "height",
                F.lit(None).cast("int").alias("duration_ms"),
            )
        ).collect()
        assert feats and all(f["mean_intensity"] is not None for f in feats)

    def test_pvdv_frames_sampled_uses_header(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.functions.videocodec import (
            video_info,
        )
        from ai_vector_database_converstion_from_pdf_spark.operators.multimodal import (
            extract_features,
            synthetic_media,
        )

        media = synthetic_media(spark, n=24)
        vids = {
            r["media_id"]: bytes(r["payload"])
            for r in media.filter(F.col("kind") == "video").collect()
        }
        stride_ms = 2000
        feats = {
            r["media_id"]: r["frames_sampled"]
            for r in extract_features(media, frame_stride_ms=stride_ms).collect()
            if r["kind"] == "video"
        }
        for vid, blob in vids.items():
            n, fps = video_info(blob)
            every = max(1, int(round(stride_ms * fps / 1000)))
            assert feats[vid] == len(range(0, n, every))
