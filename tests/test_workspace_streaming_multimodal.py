"""Integration tests: workspace sinks (S1-S9) end-to-end with embed UDF
and hybrid search; Structured Streaming ingest; multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


@pytest.fixture()
def ws(spark, tmp_path):
    from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace

    return Workspace(spark, str(tmp_path / "ws1"))


def _chunks_df(spark, n=40, dim=16):
    from ai_vector_database_converstion_from_pdf_spark.functions.embed import make_embed_udf

    docs = (
        spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .limit(n)
        .select(
            F.col("doc_id").alias("id"),
            F.col("doc_id").cast("string").alias("doc_id"),
            F.col("source").alias("source_file"),
            F.lit(1).alias("page_num"),
            F.col("doc_id").cast("int").alias("chunk_idx"),
            "text",
        )
    )
    embed = make_embed_udf(dim)
    return (
        docs.withColumn("embedding", embed(F.col("text")))
        .withColumn("model_sig", F.lit("hash-16"))
        .withColumn("model_dim", F.lit(dim))
        .withColumn("heading_path", F.lit(""))
        .withColumn("heading_level", F.lit(0))
        .withColumn("chunk_type", F.lit("text"))
        .withColumn("sentence_count", F.lit(1))
        .withColumn("list_type", F.lit(""))
        .withColumn("list_length", F.lit(0))
        .withColumn("boost_factor", F.lit(1.0))
        .withColumn("created_at", F.lit("2024-01-01 00:00:00").cast("timestamp"))
    )


class TestWorkspace:
    def test_ingest_search_feedback_cycle(self, spark, ws):
        from ai_vector_database_converstion_from_pdf_spark.functions.embed import hash_embed
        from ai_vector_database_converstion_from_pdf_spark.plans.hybrid import hybrid_search

        ws.add_chunks(_chunks_df(spark))
        assert ws.count() == 40
        assert ws.get_metadata("embedding_dimension") == "16"

        # dimension guardrail rejects a different dim (I17)
        with pytest.raises(ValueError):
            ws.add_chunks(_chunks_df(spark, n=2, dim=8))

        # search the workspace end-to-end with the same embedder
        q = "merge fast table join"
        res = hybrid_search(
            ws.chunks().select(F.col("id").alias("doc_id"), "text"),
            ws.chunks().select(F.col("id").alias("vec_id"), "embedding"),
            q,
            hash_embed(q, 16),
            k=5,
        ).collect()
        assert len(res) == 5

        # click feedback: boost applies only when not exploration (S6/S7)
        top_id = res[0]["id"]
        ws.add_interaction(q, top_id, was_exploration=False, asof="2024-01-02 00:00:00")
        boosted = ws.chunks().filter(F.col("id") == top_id).collect()[0]
        assert abs(boosted["boost_factor"] - 1.1) < 1e-9

        ws.add_interaction(q, top_id, was_exploration=True, asof="2024-01-02 00:00:00")
        still = ws.chunks().filter(F.col("id") == top_id).collect()[0]
        assert abs(still["boost_factor"] - 1.1) < 1e-9  # quarantined

        logs = ws.retrieval_logs()
        assert logs.filter(F.col("query").startswith("USER_CLICK:")).count() == 2

    def test_metadata_and_clear(self, spark, ws):
        ws.set_metadata("embed_engine", "hash")
        assert ws.get_metadata("embed_engine") == "hash"
        ws.add_chunks(_chunks_df(spark, n=5))
        ws.clear()
        assert ws.count() == 0
        assert ws.get_metadata("embedding_dimension") is None

    def test_csv_export(self, spark, ws, tmp_path):
        ws.add_chunks(_chunks_df(spark, n=5))
        out = str(tmp_path / "csv_out")
        ws.export_csv(out)
        back = spark.read.option("header", True).csv(out)
        assert back.count() == 5
        assert back.columns == ["id", "source_file", "text"]

    def test_fts_index_derived(self, spark, ws):
        ws.add_chunks(_chunks_df(spark, n=10))
        idx = ws.fts_index()
        assert idx.columns == ["id", "token"] or idx.columns == ["token", "id"]
        assert idx.count() > 0


class TestStreaming:
    def test_windowed_counts_stream(self, spark, tmp_path):
        from ai_vector_database_converstion_from_pdf_spark.sources.tables import load_events
        from ai_vector_database_converstion_from_pdf_spark.streaming.ingest_stream import (
            read_event_stream,
            run_to_memory,
            windowed_counts,
        )

        # stage a small parquet drop with micro-batch-friendly timestamps
        load_events(spark, SF_ORACLE).limit(500).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / "stream_in"))
        stream = read_event_stream(spark, str(tmp_path / "stream_in"))
        assert stream.isStreaming
        agg = windowed_counts(stream)
        run_to_memory(agg, "win_counts")
        out = spark.sql("SELECT * FROM win_counts")
        # append mode + availableNow: only watermark-closed windows emit;
        # batch recompute must agree on the emitted subset
        batch = (
            load_events(spark, SF_ORACLE)
            .limit(500)
            .groupBy(F.window("ts", "5 minutes"), "event_type")
            .agg(F.count("*").alias("n"))
            .select(F.col("window.start").alias("window_start"), "event_type", "n")
        )
        got = {(r["window_start"], r["event_type"]): r["n"] for r in out.collect()}
        exp = {(r["window_start"], r["event_type"]): r["n"] for r in batch.collect()}
        assert got
        for k, v in got.items():
            assert exp[k] == v

    def test_streaming_chunk_embed(self, spark, tmp_path):
        from ai_vector_database_converstion_from_pdf_spark.streaming.ingest_stream import (
            run_to_memory,
            streaming_ingest_chunks,
        )

        spark.read.parquet(f"{SF_ORACLE}/documents.parquet").limit(50).coalesce(
            1
        ).write.mode("overwrite").parquet(str(tmp_path / "docs_in"))
        stream = (
            spark.readStream.format("parquet")
            .schema(spark.read.parquet(str(tmp_path / "docs_in")).schema)
            .load(str(tmp_path / "docs_in"))
        )
        out = streaming_ingest_chunks(spark, stream, dim=16)
        run_to_memory(out, "chunks_out")
        rows = spark.sql("SELECT * FROM chunks_out").collect()
        assert len(rows) == 50
        assert all(len(r["embedding"]) == 16 for r in rows)


class TestMultimodal:
    def test_feature_extraction_plumbing(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.multimodal import (
            extract_features,
            synthetic_media,
        )

        media = synthetic_media(spark, n=30)
        feats = extract_features(media).collect()
        assert len(feats) == 30
        imgs = [r for r in feats if r["kind"] == "image"]
        vids = [r for r in feats if r["kind"] == "video"]
        auds = [r for r in feats if r["kind"] == "audio"]
        assert all(r["mean_intensity"] is not None for r in imgs)
        assert all(r["frames_sampled"] >= 1 for r in vids)
        assert all(r["frames_sampled"] == 0 for r in auds)
        # audio features come from a REAL PCM-WAV decode: a pure sine at
        # amplitude 12000/32768 has rms ~= 0.366/sqrt(2)... -> just
        # bound-check, and zcr grows with frequency index
        assert all(0.2 < r["rms"] < 0.3 for r in auds)
        assert all(0.0 < r["zcr"] < 1.0 for r in auds)
        assert all(r["sample_rate"] == 8000 for r in auds)
        assert all(r["rms"] is None and r["zcr"] is None for r in imgs + vids)
        # deterministic: same input → same sha1 on rerun
        again = extract_features(synthetic_media(spark, n=30)).collect()
        assert {r["sha1"] for r in feats} == {r["sha1"] for r in again}

    def test_resize_images(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.multimodal import (
            resize_images,
            synthetic_media,
        )

        media = synthetic_media(spark, n=12)
        small = resize_images(media, target=(8, 8)).collect()
        assert small  # images only
        assert all(r["width"] == 8 and r["height"] == 8 for r in small)
        # outputs are self-describing PPM files with the target raster
        from ai_vector_database_converstion_from_pdf_spark.functions.imagecodec import (
            decode_ppm,
        )

        for r in small:
            raster = decode_ppm(bytes(r["payload"]))
            assert raster.shape == (8, 8, 3)
