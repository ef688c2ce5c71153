"""Skew mitigation — salting for hot keys.

At 100 TB a single hot join/agg key (one viral document, one dominant
token) serializes a shuffle partition. AQE's skew-join handles the join
case at runtime; these helpers cover the cases AQE doesn't: skewed
AGGREGATIONS (two-phase salted aggregate) and explicit salted joins
when AQE is off or the skew is known up front.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_count(
    df: DataFrame, key: str, salt_buckets: int = 16, count_col: str = "cnt"
) -> DataFrame:
    """Two-phase skew-safe count per key: phase 1 aggregates on
    (key, random-ish salt) so a hot key spreads over `salt_buckets`
    reducers; phase 2 sums the partials. The salt is derived from a
    deterministic hash of a unique column-set via monotonically
    increasing id substitute — here pmod of xxhash64 over all columns,
    which is deterministic per row content."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    )
    partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("_partial"))
    return partial.groupBy(key).agg(F.sum("_partial").cast("long").alias(count_col))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skewed big-side equi-join: salt the big side's key, replicate the
    small side across all salt values, join on (key, salt). The hot key's
    rows spread across `salt_buckets` tasks; the small side grows by the
    same factor (only viable when it is genuinely small — otherwise use
    AQE skew-join)."""
    salted_big = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets)),
    )
    replicated_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted_big.join(replicated_small, [key, "_salt"]).drop("_salt")
