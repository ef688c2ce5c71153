"""Q1/Q2 — brute-force semantic top-k over an embedding column.

Reference: `VectorStore::search` (`vector_store.cpp:206-237`): full table
scan, cosine vs every row, sort desc, truncate. Spark-first shape: the
cosine is a codegen'd expression over a columnar Parquet scan (only the
id + vector columns are read — column pruning the reference never had),
and `orderBy(...).limit(k)` plans as TakeOrderedAndProject: each partition
keeps a k-heap, the driver merges — no global sort shuffle, O(N·dim) map
work + O(parts·k) merge. That is exactly the plan you want at 100 TB.

Determinism: rank on cosine rounded to 6 decimals, ties broken by id asc
(SURVEY §4 numeric note).
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.vector import cosine_rounded, query_vector_lit


def score_cosine(
    df: DataFrame,
    query_vec: Sequence[float] | Column,
    vec_col: str = "embedding",
    out_col: str = "score",
    digits: int = 6,
) -> DataFrame:
    if isinstance(query_vec, Column):
        return df.withColumn(out_col, cosine_rounded(F.col(vec_col), query_vec, digits))
    # literal query vector: fold its norm driver-side so the scan does
    # dot + one row-norm per row instead of three 64-element aggregates
    # (the q-norm aggregate over a literal array is not constant-folded
    # by Catalyst) — 1/3 less expression work on the hot path
    import math

    from ..functions.vector import dot, l2_norm

    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    q = query_vector_lit(query_vec)
    v = F.col(vec_col)
    denom = l2_norm(v) * F.lit(qn)
    cos = F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(v, q) / denom)
    return df.withColumn(out_col, F.round(cos, digits))


def semantic_topk(
    df: DataFrame,
    query_vec: Sequence[float] | Column,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: Iterable[str] = (),
) -> DataFrame:
    """Top-k rows by cosine(query, embedding); (score desc, id asc)."""
    scored = score_cosine(df, query_vec, vec_col=vec_col)
    cols = [id_col, *extra_cols, "score"]
    return (
        scored.select(*cols)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Brute-force k-NN for a *set* of query vectors: broadcast the query
    side (small), score every (query, corpus) pair map-side, keep top-k per
    query with a window. One scan of the corpus regardless of query count —
    the right brute-force shape at scale (queries are the small dim table).
    Approximate path for huge query sets: operators/similarity.py (LSH/IVF).
    """
    from pyspark.sql import Window

    pairs = corpus.crossJoin(F.broadcast(queries))
    scored = pairs.withColumn("score", cosine_rounded(F.col(c_vec), F.col(q_vec)))
    w = Window.partitionBy(q_id).orderBy(F.col("score").desc(), F.col(c_id).asc())
    return (
        scored.withColumn("knn_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("knn_rank") <= k)
        .select(q_id, c_id, "score", "knn_rank")
    )
