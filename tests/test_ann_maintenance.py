"""Persisted ANN index MAINTENANCE through DML (r3): the RP-LSH bucket
table is updated by add/merge/delete with the same doc-keyed,
bucket-scoped rewrites as the chunk table — never silently stale, never
dropped-and-rebuilt. The invariant proven here: after any DML sequence,
the maintained index equals a from-scratch rebuild over the current
chunks (signatures are deterministic), and untouched index bucket
directories stay byte-identical."""

from pyspark.sql import functions as F

from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace
from tests.test_workspace_streaming_multimodal import _chunks_df
from tools.fswalk import snapshot as _snapshot

DIM = 16
PARAMS = dict(dim=DIM, n_planes=4, n_tables=4)


def _sig_set(df):
    return {
        (r["id"], r["table"], r["bucket"])
        for r in df.select("id", "table", "bucket").collect()
    }


def _rebuild_set(ws):
    from ai_vector_database_converstion_from_pdf_spark.operators.similarity import (
        rp_lsh_buckets,
    )

    vecs = ws.chunks(fold_boosts=False).select(
        F.col("id").alias("vec_id"), "embedding"
    )
    return _sig_set(rp_lsh_buckets(vecs, **PARAMS))


def test_index_maintained_through_dml(spark, tmp_path):
    ws = Workspace(spark, str(tmp_path / "ann_ws"))
    ws.add_chunks(_chunks_df(spark, n=30, dim=DIM), partition_buckets=8)
    n_rows = ws.build_ann_index(**PARAMS)
    assert n_rows == 30 * PARAMS["n_tables"]
    assert ws.ann_index() is not None

    # MERGE one doc: index follows (replaced doc re-signed), and only the
    # touched index bucket directory is rewritten
    before = _snapshot(ws._tbl("ann_lsh"))
    k = ws._doc_buckets(["7"], 8)[0]
    upd = (
        _chunks_df(spark, n=30, dim=DIM)
        .filter(F.col("doc_id") == "7")
        .withColumn("text", F.lit("completely different content now"))
    )
    # re-embed the changed text so the signature actually moves
    from ai_vector_database_converstion_from_pdf_spark.functions.embed import (
        make_embed_udf,
    )

    upd = upd.withColumn("embedding", make_embed_udf(DIM)(F.col("text")))
    ws.merge_chunks(upd)
    assert ws.ann_index() is not None  # NOT invalidated
    assert _sig_set(ws.ann_index()[0]) == _rebuild_set(ws)
    after = _snapshot(ws._tbl("ann_lsh"))
    untouched_before = {
        p: h for p, h in before.items() if f"_bucket={k}/" not in p
    }
    untouched_after = {p: h for p, h in after.items() if f"_bucket={k}/" not in p}
    assert untouched_before == untouched_after

    # DELETE: the doc's signature rows vanish, index still equals rebuild
    ws.delete_doc("3")
    assert ws.ann_index() is not None
    idx = ws.ann_index()[0]
    assert idx.filter(F.col("doc_id") == "3").count() == 0
    assert _sig_set(idx) == _rebuild_set(ws)

    # APPEND: new rows signed and appended (no rewrite of old buckets)
    extra = _chunks_df(spark, n=32, dim=DIM).filter(F.col("id") >= 30)
    ws.add_chunks(extra, partition_buckets=8)
    assert ws.ann_index() is not None
    assert _sig_set(ws.ann_index()[0]) == _rebuild_set(ws)

    # clear() still drops the index with the corpus
    ws.clear()
    assert ws.ann_index() is None


def test_index_maintained_unbucketed(spark, tmp_path):
    """Unbucketed workspaces maintain the index by doc-keyed rewrite of
    the (small) index table — same rebuild-equality invariant."""
    ws = Workspace(spark, str(tmp_path / "ann_flat"))
    ws.add_chunks(_chunks_df(spark, n=20, dim=DIM))
    ws.build_ann_index(**PARAMS)
    upd = _chunks_df(spark, n=20, dim=DIM).filter(F.col("doc_id") == "5")
    ws.merge_chunks(upd)
    ws.delete_doc("9")
    assert ws.ann_index() is not None
    assert _sig_set(ws.ann_index()[0]) == _rebuild_set(ws)


def test_maintained_index_serves_ann_search(spark, tmp_path):
    """End-to-end: the maintained index feeds ann_lsh_topk and returns
    the deleted/merged-away rows never, the live rows correctly."""
    from ai_vector_database_converstion_from_pdf_spark.operators.similarity import (
        ann_lsh_topk,
    )

    ws = Workspace(spark, str(tmp_path / "ann_serve"))
    ws.add_chunks(_chunks_df(spark, n=30, dim=DIM), partition_buckets=8)
    ws.build_ann_index(**PARAMS)
    ws.delete_doc("2")
    buckets, dim, n_planes, n_tables = ws.ann_index()
    vecs = ws.chunks(fold_boosts=False).select(
        F.col("id").alias("vec_id"), "embedding"
    )
    qv = list(
        _chunks_df(spark, n=30, dim=DIM)
        .filter(F.col("id") == 4)
        .collect()[0]["embedding"]
    )
    got = ann_lsh_topk(
        vecs, qv, 5, dim, n_planes, n_tables, buckets=buckets
    ).collect()
    ids = [r["vec_id"] for r in got]
    assert 4 in ids  # the query row itself survives and matches
    assert 2 not in ids  # deleted doc's chunk can never surface
