"""Persisted, DML-maintained FTS inverted index (`Workspace.build_fts`):
serving stops paying a corpus tokenize + distinct per query, and the
index stays consistent through append/merge/delete because maintenance
rides the same doc-keyed bucket-scoped rewrites as the chunk table —
the reference's FTS5 at-rest index without its dual-write risk."""

from pyspark.sql import functions as F

from tests.test_workspace_streaming_multimodal import _chunks_df


def _derived(ws):
    from ai_vector_database_converstion_from_pdf_spark.operators.keyword import (
        build_fts_index,
    )

    return sorted(
        (r["token"], r["id"])
        for r in build_fts_index(
            ws.chunks(), id_col="id", text_col="text", heading_col="heading_path"
        ).collect()
    )


def _persisted(ws):
    return sorted((r["token"], r["id"]) for r in ws.fts_index().collect())


def test_persisted_equals_derived_and_survives_dml(spark, tmp_path):
    from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace

    ws = Workspace(spark, str(tmp_path / "fws"))
    ws.add_chunks(_chunks_df(spark, n=30), partition_buckets=4)
    assert not ws._fts_enabled()
    n = ws.build_fts()
    assert ws._fts_enabled() and n > 0
    assert _persisted(ws) == _derived(ws)

    # append maintains (O(batch) postings, no corpus read)
    ws.add_chunks(
        _chunks_df(spark, n=34).filter(F.col("id") >= 30), partition_buckets=4
    )
    assert _persisted(ws) == _derived(ws)

    # doc-level merge replaces the touched docs' postings
    upd = _chunks_df(spark, n=5).filter(F.col("id").isin([2, 3])).withColumn(
        "text", F.concat(F.lit("zzzunique replacement "), F.col("text"))
    )
    ws.merge_chunks(upd)
    post = _persisted(ws)
    assert post == _derived(ws)
    assert ("zzzunique", 2) in post

    # delete drops them
    ws.delete_doc("2")
    post = _persisted(ws)
    assert post == _derived(ws)
    assert not any(i == 2 for _, i in post)


def test_search_parity_and_plan_uses_index(spark, tmp_path):
    from ai_vector_database_converstion_from_pdf_spark.engine import PvdbEngine

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc {i} body text") for i in range(15)],
        "doc_id long, text string",
    )
    a = PvdbEngine(spark, str(tmp_path / "noidx"), dim=8)
    a.index_documents(docs, source_file="t.pdf")
    b = PvdbEngine(spark, str(tmp_path / "idx"), dim=8)
    b.index_documents(docs, source_file="t.pdf")
    b.workspace.build_fts()

    ra = [r["id"] for r in a.search("alpha gamma", k=5)]
    rb = [r["id"] for r in b.search("alpha gamma", k=5)]
    assert ra == rb and len(rb) == 5

    # the indexed workspace's fts_index plan is a scan of the persisted
    # table, not an explode over the corpus
    plan = b.workspace.fts_index()._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" not in plan, plan[:500]
    # persisted path = a pure (id, token) scan; the derived path would
    # read text/heading_path from the chunk table (the Location string
    # is elided in long tmp paths, so assert on the ReadSchema)
    assert "ReadSchema: struct<id:bigint,token:string>" in plan, plan[:500]
    plan_a = a.workspace.fts_index()._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" in plan_a, plan_a[:500]


def test_fts_under_manifest_protocol_and_optimize(spark, tmp_path):
    from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace

    ws = Workspace(spark, str(tmp_path / "mfts"), commit_protocol="manifest")
    ws.add_chunks(_chunks_df(spark, n=20), partition_buckets=4)
    ws.build_fts()
    import os

    assert os.path.isfile(ws._tbl("fts") + "/_manifest.json")
    assert _persisted(ws) == _derived(ws)
    ws.delete_doc("7")
    assert _persisted(ws) == _derived(ws)
    # several appends -> small files -> optimize compacts the fts table
    for lo in (20, 24, 28):
        ws.add_chunks(
            _chunks_df(spark, n=lo + 4).filter(F.col("id") >= lo),
            partition_buckets=4,
        )
    rep = ws.optimize(max_files_per_bucket=1)
    assert "fts" in rep["index_tables"]
    assert rep["index_tables"]["fts"]["buckets_compacted"]
    assert _persisted(ws) == _derived(ws)


def test_clear_removes_fts(spark, tmp_path):
    from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace

    ws = Workspace(spark, str(tmp_path / "cfts"))
    ws.add_chunks(_chunks_df(spark, n=8), partition_buckets=2)
    ws.build_fts()
    ws.clear()
    assert not ws._fts_enabled()
    assert not ws._exists("fts")
