"""Maintained similarity-graph index == full rebuild, bit-for-bit
(VERDICT r11 #2 — the fourth maintained family, next to ANN/IVF/FTS/
dedup-LSH).

The contract is the band-index idiom: build_sim_graph_index() signs the
corpus once and persists bands + verified pairs; every DML mutation
(append, doc-level merge, doc delete) maintains both tables with
batch-scoped work; after ANY sequence of mutations the maintained pair
table equals a from-scratch rebuild on the final chunk set — and both
equal operators/dedup.simhash_pairs on the same rows (one band layout,
three code paths, zero drift).
"""

import pytest
from pyspark.sql import functions as F

from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
    simhash_pairs,
)
from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace

SF = "/root/testdata/sf0.001"
MAX_HAMMING = 3


def _chunk_rows(spark, n=60, id_shift=0, text_override=None):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(n)
    rows = docs.select(
        (F.col("doc_id") + id_shift).alias("id"),
        (F.col("doc_id") + id_shift).cast("string").alias("doc_id"),
        F.col("source").alias("source_file"),
        F.lit(1).alias("page_num"),
        F.lit(0).alias("chunk_idx"),
        "text",
        F.lit("").alias("heading_path"),
        F.lit(0).alias("heading_level"),
        F.lit("text").alias("chunk_type"),
        F.lit(1).alias("sentence_count"),
        F.lit("").alias("list_type"),
        F.lit(0).alias("list_length"),
        F.lit(1.0).alias("boost_factor"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("created_at"),
        F.array([F.lit(float(i)) for i in range(4)]).alias("embedding"),
        F.lit("hash-4").alias("model_sig"),
        F.lit(4).alias("model_dim"),
    )
    if text_override:
        expr = F.col("text")
        for did, newtext in text_override.items():
            expr = F.when(
                F.col("doc_id") == str(did), F.lit(newtext)
            ).otherwise(expr)
        rows = rows.withColumn("text", expr)
    return rows


def _pairs_sorted(df):
    return [
        (r["id_a"], r["id_b"], r["hamming"])
        for r in df.select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
        .collect()
    ]


def _rebuild_reference(ws):
    """simhash_pairs over the CURRENT chunk set — the independent
    oracle for the maintained table (same band layout by contract)."""
    return simhash_pairs(
        ws.chunks(fold_boosts=False).select("id", "text"),
        max_hamming=MAX_HAMMING,
        id_col="id",
        text_col="text",
    )


@pytest.fixture(params=[0, 8], ids=["unbucketed", "bucketed"])
def ws(spark, tmp_path, request):
    w = Workspace(spark, str(tmp_path / "sg_ws"))
    w.add_chunks(
        _chunk_rows(spark, n=60),
        partition_buckets=request.param or None,
    )
    w.build_sim_graph_index(max_hamming=MAX_HAMMING)
    return w


def test_build_matches_operator(spark, ws):
    idx = ws.sim_graph_index()
    assert idx is not None
    pairs, mh, bits, bb = idx
    assert (mh, bits, bb) == (MAX_HAMMING, 28, 7)
    assert _pairs_sorted(pairs) == _pairs_sorted(_rebuild_reference(ws))
    # doc endpoints carried for DML maintenance
    assert {"doc_a", "doc_b"} <= set(pairs.columns)


def test_append_maintains(spark, ws):
    # arrivals include near-dups of existing docs (verbatim copies under
    # shifted ids land at hamming 0) and genuinely new pair structure
    b = int(ws.get_metadata("partition_buckets") or 0)
    ws.add_chunks(
        _chunk_rows(spark, n=20, id_shift=5_000_000),
        partition_buckets=b or None,
    )
    got = _pairs_sorted(ws.sim_graph_index()[0])
    want = _pairs_sorted(_rebuild_reference(ws))
    assert got == want and len(want) > 0


def test_merge_and_delete_maintain(spark, ws):
    base = spark.read.parquet(f"{SF}/documents.parquet").limit(3).collect()
    d0, d1 = str(base[0]["doc_id"]), str(base[1]["doc_id"])
    # rewrite one doc's text (its pairs must drop/re-verify) ...
    ws.merge_chunks(
        _chunk_rows(
            spark,
            n=3,
            text_override={d0: "a complete rewrite about spark shuffles"},
        ).filter(F.col("doc_id") == d0)
    )
    # ... and delete another outright
    ws.delete_doc(d1)
    got = _pairs_sorted(ws.sim_graph_index()[0])
    want = _pairs_sorted(_rebuild_reference(ws))
    assert got == want
    # no dangling endpoints for the deleted doc
    dangling = (
        ws.sim_graph_index()[0]
        .filter((F.col("doc_a") == d1) | (F.col("doc_b") == d1))
        .count()
    )
    assert dangling == 0


def test_graph_family_consumes_index(spark, ws):
    """The pair table is the graph ops' direct input — the maintained
    index replaces the per-session similarity_graph rebuild."""
    from ai_vector_database_converstion_from_pdf_spark.operators.graph import (
        pagerank,
    )

    edges = ws.sim_graph_index()[0].select("id_a", "id_b")
    pr = pagerank(edges, n_iter=2)
    assert pr.count() > 0


def test_no_index_is_inert(spark, tmp_path):
    w = Workspace(spark, str(tmp_path / "plain_ws"))
    w.add_chunks(_chunk_rows(spark, n=10))
    assert w.sim_graph_index() is None
    w.delete_doc(str(
        spark.read.parquet(f"{SF}/documents.parquet").first()["doc_id"]
    ))  # must not raise without the index
