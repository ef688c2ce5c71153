"""Dedup-on-ingest streaming sink: near-dups of already-ingested
content are quarantined (never silently dropped); fresh rows merge."""

from pyspark.sql import functions as F

from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace
from ai_vector_database_converstion_from_pdf_spark.streaming.ingest_stream import (
    stream_dedup_upsert_to_workspace,
)
from tests.test_workspace_streaming_multimodal import _chunks_df


def _with_text(df, pairs):
    out = df
    expr = None
    for cid, text in pairs.items():
        cond = F.col("id") == cid
        expr = F.when(cond, text) if expr is None else expr.when(cond, text)
    return out.withColumn("text", expr.otherwise(F.col("text")))


def test_stream_dedup_quarantines_and_merges(spark, tmp_path):
    ws = Workspace(spark, str(tmp_path / "ws"))
    seed = _chunks_df(spark, n=6)
    base_text = "the quick brown fox jumps over a lazy dog by the river bank"
    seed = _with_text(seed, {0: base_text})
    ws.add_chunks(seed, partition_buckets=4)
    n0 = ws.count()

    # incoming: one near-dup of chunk 0, one fresh doc, and TWO copies
    # of the same new text inside the one batch
    batch = (
        _chunks_df(spark, n=4)
        .withColumn("id", F.col("id") + 1000)
        .withColumn("doc_id", F.col("id").cast("string"))
    )
    dup_in_batch = "completely new content that repeats within this batch only"
    batch = _with_text(
        batch,
        {
            1000: base_text,          # near-dup of corpus chunk 0
            1001: "genuinely fresh text about engines and tables today",
            1002: dup_in_batch,
            1003: dup_in_batch,       # intra-batch copy
        },
    )
    src = str(tmp_path / "in")
    batch.coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(src).schema)
        .load(src)
    )
    q = stream_dedup_upsert_to_workspace(
        stream, ws, str(tmp_path / "ckpt"), threshold=0.6
    )
    q.processAllAvailable()
    q.stop()

    # merged: 1001 (fresh) + 1002 (intra-batch keeper); quarantined:
    # 1000 (dup of corpus 0) + 1003 (dup of 1002)
    ids = {r.id for r in ws.chunks().select("id").collect()}
    assert 1001 in ids and 1002 in ids
    assert 1000 not in ids and 1003 not in ids
    assert ws.count() == n0 + 2

    quar = {
        r.id: r.dup_of
        for r in spark.read.parquet(ws._tbl("dup_quarantine")).collect()
    }
    assert quar == {1000: 0, 1003: 1002}


def test_stream_dedup_empty_corpus_and_redelivery(spark, tmp_path):
    ws = Workspace(spark, str(tmp_path / "ws2"))
    batch = _chunks_df(spark, n=3)
    src = str(tmp_path / "in2")
    batch.coalesce(1).write.mode("overwrite").parquet(src)

    def run():
        stream = (
            spark.readStream.format("parquet")
            .schema(spark.read.parquet(src).schema)
            .load(src)
        )
        q = stream_dedup_upsert_to_workspace(
            stream, ws, str(tmp_path / "ck2"), threshold=0.6
        )
        q.processAllAvailable()
        q.stop()

    run()
    assert ws.count() == 3

    # re-delivery of the SAME rows as a new file: exact re-arrivals are
    # near-dups of the now-ingested corpus -> quarantined, table stable
    import glob
    import shutil

    redir = str(tmp_path / "re")
    spark.read.parquet(src).coalesce(1).write.mode("overwrite").parquet(redir)
    for f in glob.glob(f"{redir}/part-*.parquet"):
        shutil.copy(f, f"{src}/redelivered-{f.rsplit('/', 1)[1]}")
    run()
    assert ws.count() == 3
    quar = spark.read.parquet(ws._tbl("dup_quarantine"))
    assert quar.count() == 3  # every re-delivered row accounted for


def test_stream_upsert_under_manifest_protocol(spark, tmp_path):
    """The streaming sink's per-batch merge_chunks rides the manifest
    commit unchanged: postings land as immutable segments, the pointer
    advances per micro-batch, results equal the rename-protocol run."""
    import json
    import os

    ws = Workspace(spark, str(tmp_path / "mws"), commit_protocol="manifest")
    seed = _chunks_df(spark, n=6)
    ws.add_chunks(seed, partition_buckets=4)

    batch = (
        _chunks_df(spark, n=3)
        .withColumn("id", F.col("id") + 2000)
        .withColumn("doc_id", F.col("id").cast("string"))
    )
    batch = _with_text(
        batch,
        {
            2000: "stream-only fresh content row alpha",
            2001: "stream-only fresh content row beta",
            2002: "stream-only fresh content row gamma",
        },
    )
    src = str(tmp_path / "min")
    batch.coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(src).schema)
        .load(src)
    )
    q = stream_dedup_upsert_to_workspace(
        stream, ws, str(tmp_path / "mckpt"), threshold=0.6
    )
    q.processAllAvailable()
    q.stop()

    assert ws.count() == 9
    got = {r["doc_id"] for r in ws.chunks().select("doc_id").collect()}
    assert {"2000", "2001", "2002"} <= got
    m = json.load(open(ws._tbl("chunks") + "/_manifest.json"))
    assert m["v"] >= 2  # seed + at least one micro-batch commit
    # chunk data lives only in pointer-named segments
    for d in os.listdir(ws._tbl("chunks")):
        if d.startswith("_bucket="):
            segs = os.listdir(f"{ws._tbl('chunks')}/{d}")
            assert all(s.startswith("seg-") for s in segs), segs
