"""Streaming UPSERT sink: foreachBatch + Workspace.merge_chunks — a
revised document replaces its chunks, re-delivery is idempotent, and
on a bucketed workspace each batch touches only its doc_ids' buckets."""

import shutil

from pyspark.sql import functions as F

from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace
from ai_vector_database_converstion_from_pdf_spark.streaming.ingest_stream import (
    stream_upsert_to_workspace,
)
from tests.test_workspace_streaming_multimodal import _chunks_df


def test_stream_upsert_replaces_and_inserts(spark, tmp_path):
    ws = Workspace(spark, str(tmp_path / "ws"))
    ws.add_chunks(_chunks_df(spark, n=20), partition_buckets=4)

    # revision batch: docs 0-4 revised + five brand-new docs
    revised = (
        _chunks_df(spark, n=5)
        .withColumn("text", F.concat(F.lit("REVISED "), F.col("doc_id")))
    )
    fresh = (
        _chunks_df(spark, n=5)
        .withColumn("id", F.col("id") + 1000)
        .withColumn("doc_id", (F.col("id")).cast("string"))
    )
    batch_dir = str(tmp_path / "incoming")
    revised.unionByName(fresh).coalesce(1).write.mode("overwrite").parquet(batch_dir)

    stream = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(batch_dir).schema)
        .load(batch_dir)
    )
    q = stream_upsert_to_workspace(stream, ws, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()

    assert ws.count() == 25  # 20 originals - 5 replaced + 5 revised + 5 new
    assert (
        ws.chunks().filter(F.col("text").startswith("REVISED")).count() == 5
    )
    # replacement, not duplication: ids stay unique
    assert ws.chunks().select("id").distinct().count() == 25

    # at-least-once re-delivery: the same rows arriving as a NEW file
    # must merge idempotently (no growth, no dup ids)
    src = spark.read.parquet(batch_dir)
    redeliver = str(tmp_path / "incoming" / "redelivered")
    src.coalesce(1).write.mode("overwrite").parquet(redeliver)
    for f in __import__("glob").glob(f"{redeliver}/part-*.parquet"):
        shutil.copy(f, f"{batch_dir}/redelivered-{f.rsplit('/', 1)[1]}")
    shutil.rmtree(redeliver)

    q = stream_upsert_to_workspace(
        spark.readStream.format("parquet")
        .schema(src.schema)
        .load(batch_dir),
        ws,
        str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()
    assert ws.count() == 25
    assert ws.chunks().select("id").distinct().count() == 25


def test_stream_upsert_auto_compacts(spark, tmp_path):
    """With compact_every set, the sink runs Workspace.optimize after
    every N non-empty batches, so a long-lived stream never accretes
    unbounded small files; content is unaffected."""
    import os

    ws = Workspace(spark, str(tmp_path / "wsc"))
    ws.add_chunks(_chunks_df(spark, n=8), partition_buckets=2)

    # 4 micro-batches, one file each, all revising the same two docs →
    # their buckets fragment batch by batch
    batch_dir = str(tmp_path / "in2")
    os.makedirs(batch_dir)
    base = _chunks_df(spark, n=2)
    for i in range(4):
        (
            base.withColumn("text", F.lit(f"rev {i}"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(tmp_path / f"stage{i}"))
        )
        for f in __import__("glob").glob(str(tmp_path / f"stage{i}" / "part-*.parquet")):
            shutil.copy(f, f"{batch_dir}/b{i}-{f.rsplit('/', 1)[1]}")

    stream = (
        spark.readStream.format("parquet")
        .schema(base.schema)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .load(batch_dir)
    )
    q = stream_upsert_to_workspace(
        stream, ws, str(tmp_path / "ck2"), compact_every=2, max_files_per_bucket=1
    )
    q.processAllAvailable()
    q.stop()

    # every bucket is compacted to <= 2 files (cap 1 at last compaction,
    # possibly +1 from a post-compaction batch)
    root = ws._tbl("chunks")
    for e in os.listdir(root):
        if e.startswith("_bucket="):
            files = [f for f in os.listdir(os.path.join(root, e)) if f.endswith(".parquet")]
            assert len(files) <= 2, (e, files)
    assert ws.count() == 8
    assert ws.chunks().select("id").distinct().count() == 8


def test_stream_upsert_maintains_ann_index(spark, tmp_path):
    """The streaming MERGE sink flows through merge_chunks, so the
    persisted RP-LSH index stays fresh batch-by-batch (r3 maintained-
    index contract) — after the stream drains, the index equals a
    from-scratch rebuild over the final corpus."""
    from ai_vector_database_converstion_from_pdf_spark.functions.embed import (
        make_embed_udf,
    )
    from ai_vector_database_converstion_from_pdf_spark.operators.similarity import (
        rp_lsh_buckets,
    )

    ws = Workspace(spark, str(tmp_path / "ws_ann"))
    ws.add_chunks(_chunks_df(spark, n=12), partition_buckets=4)
    ws.build_ann_index(dim=16, n_planes=4, n_tables=4)

    revised = (
        _chunks_df(spark, n=4)
        .withColumn("text", F.concat(F.lit("STREAMED REWRITE "), F.col("doc_id")))
    )
    revised = revised.withColumn("embedding", make_embed_udf(16)(F.col("text")))
    batch_dir = str(tmp_path / "in_ann")
    revised.coalesce(1).write.mode("overwrite").parquet(batch_dir)

    q = stream_upsert_to_workspace(
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(batch_dir).schema)
        .load(batch_dir),
        ws,
        str(tmp_path / "ckpt_ann"),
    )
    q.processAllAvailable()
    q.stop()

    assert ws.ann_index() is not None  # maintained, never dropped
    got = {
        (r["id"], r["table"], r["bucket"])
        for r in ws.ann_index()[0].select("id", "table", "bucket").collect()
    }
    vecs = ws.chunks(fold_boosts=False).select(
        F.col("id").alias("vec_id"), "embedding"
    )
    want = {
        (r["id"], r["table"], r["bucket"])
        for r in rp_lsh_buckets(vecs, 16, n_planes=4, n_tables=4)
        .select("id", "table", "bucket")
        .collect()
    }
    assert got == want
