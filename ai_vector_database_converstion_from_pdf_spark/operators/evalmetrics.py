"""Retrieval-quality evaluation: recall@k, MRR, nDCG@k.

The measurement half of a retrieval engine — given a ranked result
table and a relevance-judgment table (qrels, TREC terminology),
compute the standard metrics per query. The reference app ships
retrieval with no quality harness; every production pipeline bolts
one on (judging ANN recall tradeoffs, rerank gains, index drift).

Determinism contract: the DCG discount 1/log2(rank+1) is a
TRANSCENDENTAL of the rank — so the per-rank discounts are computed
ONCE in Python, rounded to integer micro-units, and baked as literal
maps into BOTH engines' plans (Spark map literal, SQL CASE chain).
Per-query DCG/IDCG are then exact integer sums — no cross-engine
libm drift, no float-accumulation order sensitivity.

Scale shape: one (q, doc)-keyed join of the top-k rankings against
qrels, one per-query aggregate, one broadcast join back onto the
query-sized n_rel table. Rankings are the only corpus-scale input and
arrive pre-truncated to k rows per query.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def dcg_micro_tables(k: int) -> tuple[dict[int, int], dict[int, int]]:
    """(per-rank discount, cumulative ideal) in integer micro-units:
    term[r] = round(1/log2(r+1), 6)*1e6; cum[m] = sum_{i<=m} term[i].
    Shared constants for both engines — the ONLY place log2 runs."""
    term = {
        r: int(round(round(1.0 / math.log2(r + 1), 6) * 1e6))
        for r in range(1, k + 1)
    }
    cum, s = {}, 0
    for i in range(1, k + 1):
        s += term[i]
        cum[i] = s
    return term, cum


def retrieval_metrics(
    rankings: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    q_col: str = "q_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query metrics from `rankings` (q, doc, rank with rank 1-based,
    one row per retrieved doc) and `qrels` (q, doc — binary relevance):

      n_rel      — relevant docs for the query (from qrels)
      hits_at_k  — relevant docs retrieved in the top k
      recall_at_k= hits / n_rel
      mrr        — 1/rank of the first relevant hit (0 if none)
      ndcg_at_k  — binary-gain DCG over micro-unit discounts,
                   normalized by the ideal DCG of min(n_rel, k) hits

    Queries present in qrels but missing every hit still appear (zero
    metrics); queries absent from qrels are skipped (no denominator).
    """
    term, cum = dcg_micro_tables(k)
    term_map = F.create_map(
        *[F.lit(x) for r in range(1, k + 1) for x in (r, term[r])]
    )
    cum_map = F.create_map(
        *[F.lit(x) for m in range(1, k + 1) for x in (m, cum[m])]
    )

    n_rel = qrels.groupBy(F.col(q_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_rel")
    )
    hits = (
        rankings.filter(F.col(rank_col) <= k)
        .join(qrels, [q_col, doc_col])
        .groupBy(q_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("hits_at_k"),
            F.min(rank_col).cast("long").alias("first_rank"),
            F.sum(term_map[F.col(rank_col)]).cast("long").alias("dcg_micro"),
        )
    )
    ideal = cum_map[F.least(F.col("n_rel"), F.lit(k)).cast("int")]
    out = (
        n_rel.join(hits, q_col, "left")
        .select(
            q_col,
            "n_rel",
            F.coalesce(F.col("hits_at_k"), F.lit(0)).cast("long").alias("hits_at_k"),
            F.round(
                F.coalesce(F.col("hits_at_k"), F.lit(0)).cast("double")
                / F.col("n_rel").cast("double"),
                6,
            ).alias("recall_at_k"),
            F.when(F.col("first_rank").isNull(), F.lit(0.0))
            .otherwise(F.round(F.lit(1.0) / F.col("first_rank").cast("double"), 6))
            .alias("mrr"),
            F.round(
                F.coalesce(F.col("dcg_micro"), F.lit(0)).cast("double")
                / ideal.cast("double"),
                6,
            ).alias("ndcg_at_k"),
        )
    )
    return out
