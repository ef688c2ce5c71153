"""Composed incremental_update plan (VERDICT r8 #5 / r9 #3).

Proves the delta contract end-to-end on a bucketed workspace with every
maintained index built:

- unchanged arriving docs cost nothing (no rewrite anywhere);
- changed/new docs are re-embedded and merged; arriving docs that
  near-duplicate EXISTING corpus content are quarantined;
- snapshot_diff(before) shows changed/added chunk rows ONLY for delta
  docs — the chunk table's bytes-rewritten scale with the delta;
- per-bucket directory stamps prove buckets untouched by the delta were
  not rewritten;
- the maintained ANN/IVF/FTS indexes stay complete (row-per-chunk)
  through the patch.
"""

import pytest
from pyspark.sql import functions as F

from ai_vector_database_converstion_from_pdf_spark.functions.embed import make_embed_udf
from ai_vector_database_converstion_from_pdf_spark.plans.incremental import (
    incremental_update,
)
from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace

SF = "/root/testdata/sf0.001"
DIM = 16
BUCKETS = 8


def _doc_rows(spark, doc_ids=None, n=40, text_override=None, extra=None):
    """Chunk rows (one chunk per fixture doc) WITHOUT embedding —
    the incremental_update input shape."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(n)
    if doc_ids is not None:
        docs = docs.filter(F.col("doc_id").isin(list(doc_ids)))
    rows = docs.select(
        F.col("doc_id").alias("id"),
        F.col("doc_id").cast("string").alias("doc_id"),
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
    )
    if text_override:
        when = F
        expr = F.col("text")
        for did, newtext in text_override.items():
            expr = F.when(F.col("doc_id") == str(did), F.lit(newtext)).otherwise(expr)
        rows = rows.withColumn("text", expr).withColumn(
            # chunk ids are content keys in the ingest pipeline: a text
            # change produces a NEW chunk id (merge is doc-keyed anyway)
            "id",
            F.when(
                F.col("doc_id").isin([str(d) for d in text_override]),
                F.col("id") + 1_000_000,
            ).otherwise(F.col("id")),
        )
    if extra is not None:
        rows = rows.unionByName(extra)
    return rows


def _with_embeddings(rows, dim=DIM):
    embed = make_embed_udf(dim)
    return (
        rows.withColumn("embedding", embed(F.col("text")))
        .withColumn("model_sig", F.lit(f"hash-{dim}"))
        .withColumn("model_dim", F.lit(dim))
    )


@pytest.fixture(params=["no_dedup_index", "with_dedup_index"])
def seeded_ws(spark, tmp_path, request):
    """Both arrival-dedup paths: per-batch corpus signing (no index) and
    the maintained band table (ws.build_dedup_index) — the plan's stats
    and quarantine decisions must be identical."""
    ws = Workspace(spark, str(tmp_path / "inc_ws"))
    ws.add_chunks(_with_embeddings(_doc_rows(spark)), partition_buckets=BUCKETS)
    ws.build_ann_index(DIM)
    ws.build_ivf_index(DIM, n_centroids=4)
    ws.build_fts()
    if request.param == "with_dedup_index":
        ws.build_dedup_index()
    return ws


def _bucket_stamps(ws):
    root = ws._tbl("chunks")
    return {
        e: ws._fs.dir_stamp(f"{root}/{e}")
        for e in ws._fs.listdir(root)
        if e.startswith("_bucket=")
    }


def test_unchanged_batch_is_free(spark, seeded_ws):
    """Re-sending the identical corpus writes NOTHING."""
    before = _bucket_stamps(seeded_ws)
    n_hist = seeded_ws.history().count()
    stats = incremental_update(seeded_ws, _doc_rows(spark), dim=DIM)
    assert stats["delta_docs"] == 0 and stats["written_chunks"] == 0
    assert stats["unchanged_docs"] == stats["incoming_docs"] == 40
    assert _bucket_stamps(seeded_ws) == before
    assert seeded_ws.history().count() == n_hist  # no mutation logged


def test_delta_update_rewrites_only_delta_buckets(spark, seeded_ws):
    seeded_ws.snapshot("v1")
    before = _bucket_stamps(seeded_ws)

    # 2 changed docs + 1 genuinely new doc + 1 new doc that duplicates
    # an existing doc's text verbatim (must quarantine)
    base = spark.read.parquet(f"{SF}/documents.parquet").limit(40).collect()
    changed = {base[0]["doc_id"]: "entirely new text about spark shuffles",
               base[1]["doc_id"]: "another fully rewritten document body"}
    dup_text = base[5]["text"]
    extra = spark.createDataFrame(
        [
            (900001, "900001", "newsrc", 1, 0, "a brand new unique document about watermarks", "", 0, "text", 1, "", 0, 1.0),
            (900002, "900002", "newsrc", 1, 0, dup_text, "", 0, "text", 1, "", 0, 1.0),
        ],
        "id long, doc_id string, source_file string, page_num int, chunk_idx int, "
        "text string, heading_path string, heading_level int, chunk_type string, "
        "sentence_count int, list_type string, list_length int, boost_factor double",
    ).withColumn("created_at", F.lit("2024-01-02 00:00:00").cast("timestamp"))

    incoming = _doc_rows(spark, text_override=changed, extra=extra)
    stats = incremental_update(seeded_ws, incoming, dim=DIM)

    assert stats["incoming_docs"] == 42
    assert stats["unchanged_docs"] == 38
    assert stats["delta_docs"] == 4
    assert stats["quarantined"] == ["900002"]
    assert stats["written_docs"] == 3 and stats["written_chunks"] == 3

    # chunk-table delta == exactly the 3 written docs (snapshot_diff)
    diff = {
        (r["doc_id"], r["status"])
        for r in seeded_ws.snapshot_diff("v1").collect()
    }
    expect_docs = {str(d) for d in changed} | {"900001"}
    assert {d for d, _ in diff} == expect_docs
    # changed docs got NEW content-keyed chunk ids: old id removed, new added
    assert all(s in ("added", "removed") for _, s in diff)

    # bytes-rewritten scale with the delta: buckets not hosting a delta
    # doc have identical (count, mtime, bytes) stamps
    delta_buckets = {
        f"_bucket={r['_bucket']}"
        for r in seeded_ws._read_table("chunks")
        .filter(F.col("doc_id").isin(sorted(expect_docs)))
        .select("_bucket")
        .distinct()
        .collect()
    }
    after = _bucket_stamps(seeded_ws)
    untouched = set(before) - delta_buckets
    assert untouched, "test needs at least one untouched bucket"
    for b in untouched:
        assert after[b] == before[b], f"bucket {b} rewritten without a delta doc"

    # maintained indexes stayed complete through the patch
    n = seeded_ws.count()
    assert n == 41  # 40 + 1 new - 0 removed (changed docs replace in place)
    ann, *_ = seeded_ws.ann_index()
    assert ann.select("id").distinct().count() == n
    ivf = seeded_ws.ivf_index()[0]
    assert ivf.select("id").distinct().count() == n
    assert (
        seeded_ws.fts_index()
        .filter(F.col("token") == "watermarks")
        .count()
        > 0
    )
    # maintained band table == rebuild-from-scratch (bit-for-bit), the
    # same contract the ANN/IVF maintenance proves
    if seeded_ws.dedup_index() is not None:
        maintained = {
            tuple(r)
            for r in seeded_ws._read_table("dedup_lsh")
            .select("id", "doc_id", "band", "band_key")
            .collect()
        }
        rebuilt = {
            tuple(r)
            for r in seeded_ws._dedup_rows(
                seeded_ws.chunks(fold_boosts=False)
            )
            .select("id", "doc_id", "band", "band_key")
            .collect()
        }
        assert maintained == rebuilt


def test_quarantine_respects_threshold(spark, seeded_ws):
    """A batch doc similar-but-below-threshold is NOT quarantined."""
    base = spark.read.parquet(f"{SF}/documents.parquet").limit(40).collect()
    # take an existing doc's text and keep only the first few words —
    # low Jaccard vs the stored version
    snippet = " ".join(base[3]["text"].split()[:3]) + " plus much new content " * 10
    extra = spark.createDataFrame(
        [(900003, "900003", "newsrc", 1, 0, snippet, "", 0, "text", 1, "", 0, 1.0)],
        "id long, doc_id string, source_file string, page_num int, chunk_idx int, "
        "text string, heading_path string, heading_level int, chunk_type string, "
        "sentence_count int, list_type string, list_length int, boost_factor double",
    ).withColumn("created_at", F.lit("2024-01-02 00:00:00").cast("timestamp"))
    stats = incremental_update(
        seeded_ws, _doc_rows(spark, extra=extra), dim=DIM
    )
    assert stats["quarantined"] == [] and stats["written_docs"] == 1
