"""Q8/Q9/Q10/Q13 — weighted Reciprocal Rank Fusion + boosts + stability.

Reference: `VectorStore::hybridSearch` (`vector_store.cpp:277-574`):
two ranked lists merged by id into an rrfScores map (full-outer: ids in
either list survive), score = w_sem·1/(60+rank_sem) + w_kw·1/(60+rank_kw),
additive intent boosts (`vector_store.cpp:402-409`), a stability bias
`score += stability·mult·0.1` (`vector_store.cpp:430-458`), re-sort,
truncate.

Spark-first shape: each branch is ranked with row_number over its own
(tiny: depth = k×{3,4,6}) result, the merge is a full-outer join on id —
both branch results are ≤ ~30 rows, so Catalyst broadcasts and the fusion
is shuffle-free regardless of corpus size. RRF from integer ranks is an
exact rational in doubles → bit-identical to the DuckDB oracle, no
rounding needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

RRF_K = 60.0  # `vector_store.cpp:395`


def rank_branch(
    df: DataFrame,
    score_col: str,
    id_col: str,
    rank_name: str,
    depth: int,
    keep_score: bool = False,
) -> DataFrame:
    """(id, <rank_name>[, <score_col>]) — rank 1-based by (score desc,
    id asc), truncated to retrieval depth (`vector_store.cpp:306-319`
    depth scaling). `keep_score` carries the branch score through for
    callers that need it post-fusion (exploration compares the 0.65
    threshold against the semantic cosine, `vector_store.cpp:543-546`).

    Scale shape: orderBy().limit(depth) FIRST — plans as
    TakeOrderedAndProject (per-partition k-heap + driver merge, no global
    sort shuffle); the unpartitioned row_number window then runs over
    only `depth` rows, not the corpus."""
    topd = df.select(score_col, id_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    ).limit(depth)
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    cols = [F.col(id_col).alias("id"), F.col(rank_name)]
    if keep_score:
        cols.append(F.col(score_col))
    return topd.withColumn(rank_name, F.row_number().over(w).cast("long")).select(*cols)


def rrf_fuse(
    sem_ranked: DataFrame,
    kw_ranked: DataFrame,
    w_semantic: float = 0.5,
    w_keyword: float = 0.5,
    k: float = RRF_K,
) -> DataFrame:
    """Full-outer merge by id; absent rank contributes 0 to the score but
    is reported as rank 0 (reference `semanticRanks.value(id, 0)`).

    Output: (id, semantic_rank, keyword_rank, rrf_score).

    Shape: the full-outer semantics are expressed as union + groupBy(max)
    rather than a FULL OUTER join — Spark cannot broadcast a full-outer
    join, so the join form always plans as SortMergeJoin (two sorts + two
    exchanges) even over these ≤depth-row inputs; the union form is one
    tiny hash-aggregate exchange."""
    sem = sem_ranked.select(
        F.col(sem_ranked.columns[0]).alias("id"),
        F.col(sem_ranked.columns[1]).cast("long").alias("semantic_rank"),
        F.lit(None).cast("long").alias("keyword_rank"),
    )
    kw = kw_ranked.select(
        F.col(kw_ranked.columns[0]).alias("id"),
        F.lit(None).cast("long").alias("semantic_rank"),
        F.col(kw_ranked.columns[1]).cast("long").alias("keyword_rank"),
    )
    merged = (
        sem.unionByName(kw)
        .groupBy("id")
        .agg(
            F.max("semantic_rank").alias("semantic_rank"),
            F.max("keyword_rank").alias("keyword_rank"),
        )
    )
    sem_term = F.when(
        F.col("semantic_rank").isNotNull(),
        F.lit(w_semantic) * (F.lit(1.0) / (F.lit(k) + F.col("semantic_rank"))),
    ).otherwise(F.lit(0.0))
    kw_term = F.when(
        F.col("keyword_rank").isNotNull(),
        F.lit(w_keyword) * (F.lit(1.0) / (F.lit(k) + F.col("keyword_rank"))),
    ).otherwise(F.lit(0.0))
    return merged.select(
        "id",
        F.coalesce(F.col("semantic_rank"), F.lit(0)).cast("long").alias("semantic_rank"),
        F.coalesce(F.col("keyword_rank"), F.lit(0)).cast("long").alias("keyword_rank"),
        (sem_term + kw_term).alias("rrf_score"),
    )


def intent_boost_col(intent: str, chunk_type: F.Column, heading_level: F.Column) -> F.Column:
    """Additive intent-type boost (`vector_store.cpp:402-409`). Applied to
    rows that came through the semantic branch, as in the reference."""
    boost = F.lit(0.0)
    if intent == "definition":
        boost = F.when(chunk_type == "definition", 0.5).otherwise(0.0)
    elif intent == "summary":
        boost = F.when(chunk_type == "summary", 0.5).otherwise(0.0)
    elif intent == "procedure":
        boost = F.when(chunk_type == "list", 0.3).otherwise(0.0)
    elif intent == "example":
        boost = F.when(chunk_type == "example", 0.4).otherwise(0.0)
    if intent == "summary":
        boost = boost + F.when(heading_level == 1, 0.2).otherwise(0.0)
    return boost


def query_stability(logs: DataFrame | None, query_text: str) -> float:
    """queryStability = max(0, 1 - avg(|rank_delta|)/5) over non-exploration
    log rows for this query; 1.0 with no history (`vector_store.cpp:430-441`
    — NULL avg coerces to 0.0 there, giving 1.0)."""
    if logs is None:
        return 1.0
    row = (
        logs.filter((F.col("query") == query_text) & (F.col("is_exploration") == 0))
        .agg(F.avg(F.abs(F.col("rank_delta"))).alias("d"))
        .collect()[0]
    )
    avg_delta = row["d"] or 0.0
    return max(0.0, 1.0 - avg_delta / 5.0)


def apply_stability_bias(fused: DataFrame, stability: float, stability_mult: float) -> DataFrame:
    """score += stability·mult·0.1 (`vector_store.cpp:450-455`). Uniform per
    query — order-preserving — but kept for score parity with the reference."""
    return fused.withColumn(
        "score", F.col("rrf_score") + F.lit(stability * stability_mult * 0.1)
    ).drop("rrf_score")
