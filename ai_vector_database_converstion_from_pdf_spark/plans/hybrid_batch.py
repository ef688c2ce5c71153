"""Batch hybrid retrieval — the set-at-a-time reformulation.

The reference answers ONE query at a time (UI-driven,
`vector_store.cpp:277-574`); at training-data scale you evaluate
thousands of queries against the corpus in one job. This plan runs the
whole hybrid pipeline for N queries with:

- ONE corpus scan for the semantic branch (query vectors broadcast,
  scores computed map-side, per-query top-depth via windowed rank),
- ONE inverted-index probe for the keyword branch (query terms exploded
  and broadcast, per-(query, doc) distinct-match counts),
- a per-query full-outer RRF merge (shuffle keyed by query id — embarrassingly
  parallel across queries).

Corpus cost is O(scan) regardless of query count; everything after the
depth truncation is O(N_queries × depth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import tokens
from ..functions.vector import cosine_rounded
from ..operators.fusion import RRF_K


def hybrid_search_batch(
    queries: DataFrame,
    docs: DataFrame,
    embeddings: DataFrame,
    k: int = 5,
    depth_mult: int = 4,
    w_semantic: float = 0.5,
    w_keyword: float = 0.5,
    q_id: str = "q_id",
    q_text: str = "q_text",
    q_vec: str = "q_vec",
    doc_id: str = "doc_id",
    text_col: str = "text",
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(q_id, id, semantic_rank, keyword_rank, score) — top-k per query,
    general-intent routing (0.5/0.5, depth k×4), stability bias with no
    history (uniform +0.05 per the reference's empty-log path)."""
    depth = k * depth_mult
    corpus = docs.select(F.col(doc_id).alias("id"), F.col(text_col).alias("text"))
    vecs = embeddings.select(F.col(vec_id).alias("id"), F.col(vec_col).alias("vec"))

    # --- semantic branch: one scan of the EMBEDDING table alone, queries
    # broadcast. The branch needs no text, so joining the corpus here
    # (round-1 shape) was a pure corpus⋈corpus shuffle tax. Contract:
    # embedding ids ⊆ doc ids (workspace stores both in one table).
    qv = queries.select(F.col(q_id).alias("qid"), F.col(q_vec).alias("qvec"))
    sem_scored = vecs.crossJoin(F.broadcast(qv)).select(
        "qid", "id", cosine_rounded(F.col("vec"), F.col("qvec")).alias("sim")
    )
    wsem = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("id").asc())
    sem_ranked = (
        sem_scored.withColumn("semantic_rank", F.row_number().over(wsem).cast("long"))
        .filter(F.col("semantic_rank") <= depth)
        .select("qid", "id", "semantic_rank")
    )

    # --- keyword branch: per-query term sets, one token-table probe ---
    qt = queries.select(
        F.col(q_id).alias("qid"), F.explode(tokens(F.col(q_text))).alias("token")
    ).distinct()
    doc_tokens = corpus.select(
        "id", F.explode(tokens(F.col("text"))).alias("token")
    ).distinct()
    matches = (
        doc_tokens.join(F.broadcast(qt), "token")
        .groupBy("qid", "id")
        .agg(F.count("*").cast("long").alias("match_cnt"))
    )
    wkw = Window.partitionBy("qid").orderBy(
        F.col("match_cnt").desc(), F.col("id").asc()
    )
    kw_ranked = (
        matches.withColumn("keyword_rank", F.row_number().over(wkw).cast("long"))
        .filter(F.col("keyword_rank") <= depth)
        .select("qid", "id", "keyword_rank")
    )

    # --- per-query RRF full-outer merge + uniform stability bias ---
    # union + groupBy(max) instead of a FULL OUTER join: full-outer always
    # plans as SortMergeJoin (never broadcastable); the union form is one
    # hash-aggregate exchange keyed by (qid, id)
    merged = (
        sem_ranked.select(
            "qid", "id", "semantic_rank", F.lit(None).cast("long").alias("keyword_rank")
        )
        .unionByName(
            kw_ranked.select(
                "qid", "id", F.lit(None).cast("long").alias("semantic_rank"), "keyword_rank"
            )
        )
        .groupBy("qid", "id")
        .agg(
            F.max("semantic_rank").alias("semantic_rank"),
            F.max("keyword_rank").alias("keyword_rank"),
        )
    )
    sem_term = F.when(
        F.col("semantic_rank").isNotNull(),
        F.lit(w_semantic) / (F.lit(RRF_K) + F.col("semantic_rank")),
    ).otherwise(0.0)
    kw_term = F.when(
        F.col("keyword_rank").isNotNull(),
        F.lit(w_keyword) / (F.lit(RRF_K) + F.col("keyword_rank")),
    ).otherwise(0.0)
    bias = 1.0 * 0.5 * 0.1  # stability 1.0 x general mult 0.5 x 0.1
    fused = merged.select(
        F.col("qid").alias(q_id),
        "id",
        F.coalesce("semantic_rank", F.lit(0)).cast("long").alias("semantic_rank"),
        F.coalesce("keyword_rank", F.lit(0)).cast("long").alias("keyword_rank"),
        (sem_term + kw_term + F.lit(bias)).alias("score"),
    )
    wtop = Window.partitionBy(q_id).orderBy(F.col("score").desc(), F.col("id").asc())
    return (
        fused.withColumn("rank", F.row_number().over(wtop).cast("long"))
        .filter(F.col("rank") <= k)
        .select(q_id, "id", "semantic_rank", "keyword_rank", "score", "rank")
    )
