"""Blocked-broadcast GEMM near-dup: parity with the expression oracle
and with itself across block counts (driver memory stays one-block-flat
regardless of corpus size — VERDICT r1 scale fix #2)."""

import pyspark.sql.functions as F

from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
    embedding_near_dup_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


def _pairs(df):
    return sorted(
        (r["id_a"], r["id_b"], round(r["cos"], 6)) for r in df.collect()
    )


def test_gemm_matches_expr(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = _pairs(embedding_near_dup_pairs(emb, threshold=0.45))
    want = _pairs(embedding_near_dup_pairs(emb, threshold=0.45, method="expr"))
    assert got == want
    assert len(got) > 0


def test_gemm_block_count_invariant(spark):
    """Forcing many tiny blocks (block_bytes small enough for ~8 blocks)
    must give the identical pair set: blocks partition the build side, so
    each (a,b) pair appears in exactly one block's output."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    one = _pairs(embedding_near_dup_pairs(emb, threshold=0.45))
    n = emb.count()
    dim = emb.select(F.max(F.size("embedding"))).collect()[0][0]
    row_bytes = 8 * dim + 16
    blocked = _pairs(
        embedding_near_dup_pairs(
            emb, threshold=0.45, block_bytes=max(1, n * row_bytes // 8)
        )
    )
    assert blocked == one
