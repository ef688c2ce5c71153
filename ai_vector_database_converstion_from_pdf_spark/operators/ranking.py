"""Distributed exact global ranking — the scale-safe replacement for
``row_number()/ntile()/sum() OVER (ORDER BY ...)`` with no PARTITION BY.

An unpartitioned window is a single-task global sort: Spark warns
``WindowExec: No Partition Defined`` and at 10^9 entities one executor
sorts (and spills) the whole table. The exact semantics are recoverable
fully partition-parallel with the classic two-level rank:

1. ``repartitionByRange`` on the (tie-broken, total-order) sort key —
   every partition holds a contiguous key range, partitions ordered by
   ``spark_partition_id``.
2. rank / running-sum WITHIN each partition (distributed window).
3. a per-partition (count, sum) side table — at most ``numPartitions``
   rows — cumulated and broadcast back; global rank = partition offset +
   local rank, global running sum = partition sum offset + local sum.

Result is bit-identical to the single-partition window whenever the
order columns form a total order (callers must include a unique
tiebreaker — the same requirement the DuckDB oracles already meet).
``ntile_from_rank`` then derives exact NTILE(n) buckets arithmetically
(SQL-standard semantics: first N mod n buckets get one extra row), so no
second pass is needed.

This generalizes ``packing.shuffle_order``'s hash-prefix bucketing
(which needs a uniform key) to arbitrary data-valued sort keys.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def _sort_exprs(order_by: Sequence) -> list[Column]:
    """Normalize order spec: Column objects pass through; strings become
    ascending columns; ("col", "desc") tuples flip direction."""
    out: list[Column] = []
    for o in order_by:
        if isinstance(o, Column):
            out.append(o)
        elif isinstance(o, tuple):
            name, direction = o
            c = F.col(name)
            out.append(c.desc() if str(direction).lower().startswith("d") else c.asc())
        else:
            out.append(F.col(o).asc())
    return out


def with_global_rank(
    df: DataFrame,
    order_by: Sequence,
    rank_col: str = "rnk",
    cumsum_of: str | None = None,
    cumsum_col: str = "cum",
    total_cols: dict[str, str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``row_number() OVER (ORDER BY order_by)`` as ``rank_col``
    (long, 1-based) without a single-partition sort.

    ``order_by``: sequence of column names, ``(name, "desc")`` tuples, or
    Column sort expressions. MUST be a total order (include a unique
    tiebreaker) for deterministic output.

    ``cumsum_of``: optionally also compute the exact running sum of this
    column over the same ordering (ROWS UNBOUNDED PRECEDING .. CURRENT)
    into ``cumsum_col``.

    ``total_cols``: optional {out_col: "count" | "sum"} — attach the
    global row count / global sum of ``cumsum_of`` as constant columns
    (saves callers a second aggregate + cross join).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    exprs = _sort_exprs(order_by)

    ranged = df.repartitionByRange(num_partitions, *exprs).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*exprs)
    local = ranged.withColumn("_lrank", F.row_number().over(w))
    aggs = [F.count(F.lit(1)).alias("_n")]
    if cumsum_of is not None:
        local = local.withColumn(
            "_lcum",
            F.sum(cumsum_of).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        aggs.append(F.sum(cumsum_of).alias("_s"))

    # numPartitions-row side table; the windows below run over THIS
    # aggregate, not the data. The constant partition key is deliberate:
    # the input is bounded at numPartitions rows, and keying it keeps the
    # (misleading at this size) WindowExec single-partition warning out
    # of the logs of every caller. It must come out of the AGGREGATE
    # (min over a literal) — a plain lit(0) is foldable and Catalyst
    # prunes it from the window spec, resurrecting the warning.
    aggs.append(F.min(F.lit(0)).alias("_one"))
    stats = local.groupBy("_pid").agg(*aggs)
    prior = (
        Window.partitionBy("_one")
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    everything = (
        Window.partitionBy("_one")
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    off_cols = [
        F.col("_pid"),
        F.coalesce(F.sum("_n").over(prior), F.lit(0)).alias("_off"),
    ]
    if total_cols:
        for out_name, kind in total_cols.items():
            src = "_n" if kind == "count" else "_s"
            off_cols.append(F.sum(src).over(everything).alias(out_name))
    if cumsum_of is not None:
        off_cols.append(F.coalesce(F.sum("_s").over(prior), F.lit(0)).alias("_soff"))
    offsets = stats.select(*off_cols)

    joined = local.join(F.broadcast(offsets), "_pid")
    joined = joined.withColumn(
        rank_col, (F.col("_off") + F.col("_lrank")).cast("long")
    )
    if cumsum_of is not None:
        joined = joined.withColumn(cumsum_col, F.col("_soff") + F.col("_lcum"))
    drop = ["_pid", "_lrank", "_off"] + (
        ["_lcum", "_soff"] if cumsum_of is not None else []
    )
    return joined.drop(*drop)


def ntile_from_rank(rank_col: Column, total_col: Column, n: int) -> Column:
    """SQL-standard NTILE(n) derived from an exact 1-based rank and the
    total row count: with N rows, the first N mod n buckets hold
    ceil(N/n) rows, the rest floor(N/n). Pure arithmetic — no window."""
    q = F.floor(total_col / n)
    rem = total_col % n
    big = rem * (q + F.lit(1))  # rows covered by the oversized buckets
    return (
        F.when(
            rank_col <= big, F.floor((rank_col - 1) / (q + F.lit(1))) + F.lit(1)
        )
        .otherwise(rem + F.floor((rank_col - 1 - big) / q) + F.lit(1))
        .cast("long")
    )
