"""Frequent-item (heavy-hitter) mining with mergeable Misra-Gries summaries.

A 100 TB curation pipeline asks "which n-grams / domains / boilerplate
phrases exceed x% of the corpus?" constantly (phrase mining, stopword
induction, template detection). The naive answer — groupBy(gram).count()
— shuffles the FULL gram vocabulary, which at corpus scale is billions of
distinct keys. This module uses the classic two-phase exact scheme:

1. **Misra-Gries partial summaries** per Arrow batch (`mapInPandas`,
   map-side only, no shuffle): each batch is reduced to at most ``k``
   (item, residual) counters. MG's guarantee makes the union of batch
   summaries a *superset* of every item with global frequency
   ≥ N/(k+1): a batch of N_b rows undercounts any item by at most
   N_b/(k+1), and undercounts sum to ≤ N/(k+1) across batches — so an
   item missing from every summary has true count < N/(k+1)
   (Agarwal et al., "Mergeable Summaries", PODS'12).
2. **Exact recount of candidates only**: broadcast the candidate set
   (≤ k × n_batches rows) back over the gram stream and count exactly.
   The shuffle now carries only candidate keys — bounded by the summary
   size, independent of vocabulary size.

With threshold phi ≥ 1/(k+1) the result is EXACT (no false negatives by
the MG bound, no false positives by the recount), which is why the
catalog entry can be value-checked against a brute-force DuckDB oracle.

Thresholds are integer basis points (``cnt * 10000 >= phi_bp * N``) so
both engines compare in exact integer arithmetic — no float ceil()
boundary disagreements.

Reference semantics: the reference app has no sketch module; this is a
training-pipeline extension (SURVEY.md §6 / BASELINE.json north star).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions.text import tokens


def token_ngrams(
    docs: DataFrame, n: int = 2, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, gram) stream of word n-grams, built JVM-side: tokenize once,
    slide with ``transform`` over index ranges, explode. Narrow — no
    shuffle; column pruning keeps the scan at (id, text)."""
    base = docs.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("ts")
    )
    if n == 1:
        return base.select("id", F.explode("ts").alias("gram"))
    # Sliding windows WITHOUT higher-order functions: HOF lambdas
    # (transform/aggregate) run on Spark's interpreted path per element
    # — ~20x slower than codegen on a corpus-sized explode. slice +
    # arrays_zip are ordinary codegen'd expressions: n shifted views of
    # the token array zip into per-window structs, and the string concat
    # happens AFTER the explode as a plain row expression.
    win_len = F.size("ts") - n + 1
    zipped = F.arrays_zip(
        *[F.slice("ts", j + 1, win_len).alias(f"w{j}") for j in range(n)]
    )
    return (
        base.filter(F.size("ts") >= n)
        .select("id", F.explode(zipped).alias("p"))
        .select(
            "id",
            F.concat_ws(" ", *[F.col(f"p.w{j}") for j in range(n)]).alias("gram"),
        )
    )


def _mg_summaries(k: int):
    """mapInPandas generator: per incoming batch, exact value_counts
    reduced to ≤ k Misra-Gries counters (decrement all by the (k+1)-st
    largest count, drop non-positive). Emits one extra row per batch
    (gram=NULL) carrying the batch's total row count so the caller can
    recover N without a second corpus scan."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            counts = pdf["gram"].value_counts()
            if len(counts) > k:
                cut = int(counts.iloc[k])  # (k+1)-st largest
                counts = counts.iloc[:k] - cut
                counts = counts[counts > 0]
            out = pd.DataFrame(
                {"gram": counts.index.astype(str), "cnt": counts.to_numpy("int64")}
            )
            total = pd.DataFrame({"gram": [None], "cnt": [len(pdf)]})
            yield pd.concat([out, total], ignore_index=True)

    return gen


def heavy_hitters(
    grams: DataFrame,
    phi_bp: int,
    k: int | None = None,
    gram_col: str = "gram",
) -> DataFrame:
    """Exact items with global frequency ≥ phi_bp/10000 of the stream.

    Output: (gram, cnt) — exact counts, only rows passing the threshold.
    Requires phi_bp ≥ 10000/(k+1) for the exactness guarantee; the
    default k = ceil(1.25 * 10000/phi_bp) satisfies it with margin.
    """
    if k is None:
        k = math.ceil(1.25 * 10000 / phi_bp)
    if phi_bp * (k + 1) < 10000:
        raise ValueError(f"k={k} too small for phi_bp={phi_bp}: exactness lost")

    stream = grams.select(F.col(gram_col).alias("gram"))
    summaries = stream.mapInPandas(_mg_summaries(k), "gram string, cnt long")
    # One aggregate pass over the summary stream (bounded: ≤ (k+1) rows
    # per Arrow batch) yields N and the candidate set in one collect —
    # the bounded driver-side surface SURVEY §4 sanctions.
    merged = summaries.groupBy("gram").agg(F.sum("cnt").alias("cnt")).collect()
    n_total = sum(r["cnt"] for r in merged if r["gram"] is None)
    cand = [r["gram"] for r in merged if r["gram"] is not None]
    if not cand or n_total == 0:
        return stream.groupBy("gram").agg(F.count(F.lit(1)).alias("cnt")).limit(0)
    # Exact recount of candidates only: the In-predicate pushes into the
    # scan; the groupBy shuffles ≤ |cand| keys with map-side combine.
    exact = (
        stream.filter(F.col("gram").isin(cand))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # integer-exact threshold: cnt/N >= phi_bp/10000
    return exact.filter(F.col("cnt") * 10000 >= F.lit(phi_bp * n_total)).orderBy(
        F.desc("cnt"), F.asc("gram")
    )
