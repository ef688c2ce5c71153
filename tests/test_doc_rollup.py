"""Continuous-aggregate doc rollup (hypertable-rollup analog): a per-doc
aggregate table maintained THROUGH DML — appends land mergeable partial
rows (O(batch), no corpus read), doc-level merge/delete rewrite only the
touched docs' partials via the same bucket-scoped swaps as the chunk
table. Invariant proven here: after any DML sequence, folding the
partials equals recomputing the aggregates from the chunk table."""

from pyspark.sql import functions as F

from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace
from tests.test_workspace_streaming_multimodal import _chunks_df
from tools.fswalk import snapshot as _snapshot

DIM = 8


def _recompute(ws):
    return {
        r["doc_id"]: (
            r["n_chunks"], r["total_chars"], r["n_code_chunks"],
            r["max_chunk_idx"], r["first_created_at"], r["last_created_at"],
        )
        for r in ws.chunks(fold_boosts=False)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum(F.length("text")).cast("long").alias("total_chars"),
            F.sum(F.when(F.col("chunk_type") == "code", 1).otherwise(0))
            .cast("long")
            .alias("n_code_chunks"),
            F.max("chunk_idx").cast("long").alias("max_chunk_idx"),
            F.min("created_at").alias("first_created_at"),
            F.max("created_at").alias("last_created_at"),
        )
        .collect()
    }


def _rollup(ws):
    return {
        r["doc_id"]: (
            r["n_chunks"], r["total_chars"], r["n_code_chunks"],
            r["max_chunk_idx"], r["first_created_at"], r["last_created_at"],
        )
        for r in ws.doc_rollup().collect()
    }


def test_rollup_maintained_through_dml(spark, tmp_path):
    ws = Workspace(spark, str(tmp_path / "ru_ws"))
    ws.add_chunks(_chunks_df(spark, n=30, dim=DIM), partition_buckets=8)
    ws.enable_doc_rollup()
    assert _rollup(ws) == _recompute(ws)

    # APPEND: partials accumulate, fold still equals recompute; no old
    # rollup bucket directory is rewritten (pure append)
    before = _snapshot(ws._tbl("doc_rollup"))
    extra = _chunks_df(spark, n=40, dim=DIM).filter(F.col("id") >= 30)
    ws.add_chunks(extra, partition_buckets=8)
    assert _rollup(ws) == _recompute(ws)
    after = _snapshot(ws._tbl("doc_rollup"))
    # old partition files untouched (marker files like _SUCCESS at the
    # table root are refreshed by any append — exclude them)
    old_parts = {p: h for p, h in before.items() if "_bucket=" in p}
    assert set(old_parts).issubset(set(after))
    assert all(after[p] == h for p, h in old_parts.items())

    # MERGE one doc: only the touched rollup bucket is rewritten
    k = ws._doc_buckets(["7"], 8)[0]
    before = _snapshot(ws._tbl("doc_rollup"))
    upd = (
        _chunks_df(spark, n=30, dim=DIM)
        .filter(F.col("doc_id") == "7")
        .withColumn("text", F.lit("short"))
    )
    ws.merge_chunks(upd)
    assert _rollup(ws) == _recompute(ws)
    after = _snapshot(ws._tbl("doc_rollup"))
    ub = {p: h for p, h in before.items() if f"_bucket={k}/" not in p}
    ua = {p: h for p, h in after.items() if f"_bucket={k}/" not in p}
    assert ub == ua

    # DELETE: the doc's rollup row vanishes, fold equals recompute
    ws.delete_doc("3")
    rows = _rollup(ws)
    assert "3" not in rows
    assert rows == _recompute(ws)

    # COMPACTION folds partials, values preserved
    ws.compact_rollup()
    assert _rollup(ws) == _recompute(ws)
    # after compaction there is exactly one partial row per (doc, bucket)
    raw = spark.read.parquet(ws._tbl("doc_rollup"))
    assert raw.count() == raw.select("doc_id").distinct().count()


def test_rollup_unbucketed_workspace(spark, tmp_path):
    ws = Workspace(spark, str(tmp_path / "ru_flat"))
    ws.add_chunks(_chunks_df(spark, n=12, dim=DIM))
    ws.enable_doc_rollup()
    assert _rollup(ws) == _recompute(ws)
    ws.delete_doc("1")
    assert _rollup(ws) == _recompute(ws)
    ws.compact_rollup()
    assert _rollup(ws) == _recompute(ws)


def test_rollup_enable_is_idempotent_rebuild(spark, tmp_path):
    ws = Workspace(spark, str(tmp_path / "ru_re"))
    ws.add_chunks(_chunks_df(spark, n=10, dim=DIM), partition_buckets=4)
    ws.enable_doc_rollup()
    first = _rollup(ws)
    ws.enable_doc_rollup()  # rebuild from current chunks
    assert _rollup(ws) == first == _recompute(ws)


def test_rollup_disabled_raises_and_clear_removes(spark, tmp_path):
    import pytest

    ws = Workspace(spark, str(tmp_path / "ru_clear"))
    ws.add_chunks(_chunks_df(spark, n=6, dim=DIM))
    with pytest.raises(ValueError):
        ws.doc_rollup()
    ws.enable_doc_rollup()
    ws.doc_rollup().collect()
    ws.clear()
    with pytest.raises(ValueError):
        ws.doc_rollup()


def test_rollup_fresh_workspace_via_merge(spark, tmp_path):
    """merge_chunks on a fresh workspace delegates to the append core —
    the rollup must follow that path too."""
    ws = Workspace(spark, str(tmp_path / "ru_fresh"))
    ws.set_metadata("doc_rollup", "1")  # enabled before any data
    ws.merge_chunks(_chunks_df(spark, n=8, dim=DIM))
    assert _rollup(ws) == _recompute(ws)


def test_rollup_fresh_through_streaming_upserts(spark, tmp_path):
    """The streaming upsert sink goes through merge_chunks, so the
    rollup must stay fresh through micro-batches with zero extra code."""
    from ai_vector_database_converstion_from_pdf_spark.streaming.ingest_stream import (
        stream_upsert_to_workspace,
    )

    ws = Workspace(spark, str(tmp_path / "ru_stream"))
    ws.add_chunks(_chunks_df(spark, n=20, dim=DIM), partition_buckets=4)
    ws.enable_doc_rollup()

    revised = (
        _chunks_df(spark, n=5, dim=DIM)
        .withColumn("text", F.concat(F.lit("REVISED "), F.col("doc_id")))
    )
    fresh = (
        _chunks_df(spark, n=5, dim=DIM)
        .withColumn("id", F.col("id") + 1000)
        .withColumn("doc_id", (F.col("id")).cast("string"))
    )
    batch_dir = str(tmp_path / "incoming")
    revised.unionByName(fresh).coalesce(1).write.mode("overwrite").parquet(batch_dir)

    q = stream_upsert_to_workspace(
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(batch_dir).schema)
        .load(batch_dir),
        ws,
        str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    assert _rollup(ws) == _recompute(ws)


def test_rollup_feeds_governor_and_evaluate(spark, tmp_path):
    """Serving integration (r3 item 8): with a rollup-enabled workspace
    the engine's governor depth hint and evaluate() sibling counts come
    from the maintained rollup — one fewer corpus aggregate per pass —
    and results are identical to the corpus-scan path."""
    from ai_vector_database_converstion_from_pdf_spark.engine import PvdbEngine

    def build(path, enable):
        eng = PvdbEngine(spark, str(tmp_path / path), dim=DIM)
        docs = spark.createDataFrame(
            [(i, f"alpha beta doc {i} text body") for i in range(12)],
            "doc_id long, text string",
        )
        eng.index_documents(docs, source_file="t.pdf")
        if enable:
            eng.workspace.enable_doc_rollup()
        return eng

    a = build("noru", False)
    b = build("ru", True)

    # governor hint: None without rollup, the exact chunk total with it
    assert a._rollup_chunk_total() is None
    assert b._rollup_chunk_total() == 12

    # the hint clamps planned depth to the corpus size
    plan = b.governor.plan(5, 10, "general", corpus_chunks=b._rollup_chunk_total())
    assert plan["depth"] == 12  # min(5*10, 12)
    unclamped = a.governor.plan(5, 10, "general", corpus_chunks=None)
    assert unclamped["depth"] == 50

    # search parity: same results either way
    ra = [r["id"] for r in a.search("alpha beta", k=4)]
    rb = [r["id"] for r in b.search("alpha beta", k=4)]
    assert ra == rb and len(rb) == 4

    # hint invalidates with the corpus
    b.delete_document("3")
    assert b._rollup_chunk_total() == 11

    # evaluate parity (rollup-backed sibling counts vs corpus groupBy):
    # single-chunk docs have no siblings in this fixture, so both paths
    # must agree on the degenerate result too
    ea = a.evaluate(n_queries=3, k=2)
    eb = b.evaluate(n_queries=3, k=2)
    assert ea == eb


def test_rollup_hint_sees_external_dml(spark, tmp_path):
    """ADVICE r6: the governor depth hint is keyed on the workspace
    mutation stamp, so DML through a DIFFERENT engine (or any direct
    Workspace writer) over the same path invalidates it — no stale
    depth hint for multi-writer workspaces."""
    from ai_vector_database_converstion_from_pdf_spark.engine import PvdbEngine

    path = str(tmp_path / "shared_ws")
    a = PvdbEngine(spark, path, dim=DIM)
    docs = spark.createDataFrame(
        [(i, f"alpha doc {i} body") for i in range(6)],
        "doc_id long, text string",
    )
    a.index_documents(docs, source_file="t.pdf")
    a.workspace.enable_doc_rollup()
    assert a._rollup_chunk_total() == 6

    # a SECOND engine mutates the same workspace; engine a never hears
    # about it through its own mutator paths
    b = PvdbEngine(spark, path, dim=DIM)
    b.delete_document("2")
    assert a._rollup_chunk_total() == 5
