"""Distributed exact global ranking — the scale-safe replacement for
``row_number()/ntile()/sum() OVER (ORDER BY ...)`` with no PARTITION BY.

An unpartitioned window is a single-task global sort: Spark warns
``WindowExec: No Partition Defined`` and at 10^9 entities one executor
sorts (and spills) the whole table. The exact semantics are recoverable
fully partition-parallel with the classic two-level rank:

1. split the key space into contiguous ranges with BROADCAST QUANTILE
   BREAKPOINTS — a deterministic hash-rate sample of the sort-key
   tuples, sorted driver-side, evenly cut. Every row's range bucket is
   then a pure map-side EXPRESSION of its own values (a lexicographic
   comparison against ≤ numPartitions-1 literal tuples).
2. rank / running-sum WITHIN each bucket (distributed window).
3. a per-bucket (count, sum) side table — at most ``num_partitions``
   rows — cumulated and broadcast back; global rank = bucket offset +
   local rank.

Why value-based buckets and not ``repartitionByRange`` +
``spark_partition_id``: the range partitioner SAMPLES its boundaries at
execution time, and a DataFrame subtree that feeds several jobs (the
offsets aggregate, a broadcast side, the final projection) can execute
more than once with DIFFERENT boundaries — the partition-id offsets
then disagree with the final layout and ranks come out silently wrong
(measured: 50k-row corpus, 32 cores — 48,631 distinct "ranks" for
50,000 rows). A bucket derived from the row's own values is identical
on every recomputation by construction.

Breakpoint quality only affects load balance, never correctness: ranks
are exact for ANY cut points because the bucket function is monotone in
the sort order and each bucket is ranked exactly by the full key.

``ntile_from_rank`` then derives exact NTILE(n) buckets arithmetically
(SQL-standard semantics: first N mod n buckets get one extra row), so
no second pass is needed. This generalizes ``packing.shuffle_order``'s
hash-prefix bucketing (which needs a uniform key) to arbitrary
data-valued sort keys.

Contract: sort keys must be non-null (the callers' keys are aggregates
or ids; a null would sort engine-dependently anyway).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def _parse_order(order_by: Sequence) -> list[tuple[str, bool]]:
    """Normalize order spec to [(column_name, is_desc)]. Names or
    ("col", "asc"|"desc") tuples — the lexicographic breakpoint
    comparison needs named fields with literal values, so raw Column
    expressions are not accepted (alias them first)."""
    out: list[tuple[str, bool]] = []
    for o in order_by:
        if isinstance(o, tuple):
            name, direction = o
            out.append((name, str(direction).lower().startswith("d")))
        elif isinstance(o, str):
            out.append((o, False))
        else:
            raise TypeError(
                f"order_by entries must be names or (name, dir) tuples, got {o!r}"
            )
    return out


def _row_after_bp(specs: list[tuple[str, bool]], bp: tuple) -> Column:
    """Lexicographic "this row sorts strictly after the breakpoint"
    under the per-field directions: (f1 ≻ v1) OR (f1 = v1 AND f2 ≻ v2)
    OR ... where ≻ is > for asc fields and < for desc fields."""
    cond = F.lit(False)
    for (name, is_desc), v in reversed(list(zip(specs, bp))):
        c, lv = F.col(name), F.lit(v)
        after = (c < lv) if is_desc else (c > lv)
        cond = after | ((c == lv) & cond)
    return cond


def with_global_rank(
    df: DataFrame,
    order_by: Sequence,
    rank_col: str = "rnk",
    cumsum_of: str | None = None,
    cumsum_col: str = "cum",
    total_cols: dict[str, str] | None = None,
    num_partitions: int | None = None,
    sample_target: int = 65536,
) -> DataFrame:
    """Exact ``row_number() OVER (ORDER BY order_by)`` as ``rank_col``
    (long, 1-based) without a single-partition sort.

    ``order_by``: sequence of column names or ``(name, "desc")`` tuples.
    MUST be a total order (include a unique tiebreaker) for
    deterministic output; keys must be non-null.

    ``cumsum_of``: optionally also compute the exact running sum of this
    column over the same ordering (ROWS UNBOUNDED PRECEDING .. CURRENT)
    into ``cumsum_col``.

    ``total_cols``: optional {out_col: "count" | "sum"} — attach the
    global row count / global sum of ``cumsum_of`` as constant columns
    (saves callers a second aggregate + cross join).

    Cost: one column-pruned count + one hash-rate sample collect (≤
    ``sample_target`` key tuples) + one keyed window pass + one tiny
    offsets aggregate. No stage ever holds more than one bucket's rows.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    specs = _parse_order(order_by)
    exprs = [
        (F.col(n).desc() if d else F.col(n).asc()) for n, d in specs
    ]
    key_cols = [F.col(n) for n, _ in specs]

    # -- breakpoints: deterministic hash-rate sample of the key tuples --
    n_rows = df.count()  # column-pruned map-side count
    rate_den = max(1, n_rows // max(1, sample_target))
    key_hash = F.xxhash64(*[c.cast("string") for c in key_cols])
    sample = [
        tuple(r)
        for r in df.select(*key_cols)
        .filter(F.pmod(key_hash, F.lit(rate_den)) == 0)
        .collect()
    ]
    # driver-side sort under the requested order (stable sorts from the
    # last field back = lexicographic with per-field direction)
    for idx in range(len(specs) - 1, -1, -1):
        sample.sort(key=lambda t, i=idx: t[i], reverse=specs[idx][1])
    n_cuts = min(num_partitions - 1, max(0, len(sample) - 1))
    cuts = [
        sample[(len(sample) * (i + 1)) // (n_cuts + 1)] for i in range(n_cuts)
    ]
    # bucket = number of breakpoints this row sorts after — a pure
    # map-side expression, identical on every recomputation
    bucket = F.lit(0)
    for bp in cuts:
        bucket = bucket + F.when(_row_after_bp(specs, bp), 1).otherwise(0)
    local = df.withColumn("_rbkt", bucket)

    w = Window.partitionBy("_rbkt").orderBy(*exprs)
    local = local.withColumn("_lrank", F.row_number().over(w))
    aggs = [F.count(F.lit(1)).alias("_n")]
    if cumsum_of is not None:
        local = local.withColumn(
            "_lcum",
            F.sum(cumsum_of).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        aggs.append(F.sum(cumsum_of).alias("_s"))

    # ≤ num_partitions-row side table; the windows below run over THIS
    # aggregate, not the data. The constant partition key is deliberate:
    # the input is bounded, and keying it keeps the (misleading at this
    # size) WindowExec single-partition warning out of every caller's
    # logs. It must come out of the AGGREGATE (min over a literal) — a
    # plain lit(0) is foldable and Catalyst prunes it from the window
    # spec, resurrecting the warning.
    aggs.append(F.min(F.lit(0)).alias("_one"))
    stats = local.groupBy("_rbkt").agg(*aggs)
    prior = (
        Window.partitionBy("_one")
        .orderBy("_rbkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    everything = (
        Window.partitionBy("_one")
        .orderBy("_rbkt")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    off_cols = [
        F.col("_rbkt"),
        F.coalesce(F.sum("_n").over(prior), F.lit(0)).alias("_off"),
    ]
    if total_cols:
        for out_name, kind in total_cols.items():
            src = "_n" if kind == "count" else "_s"
            off_cols.append(F.sum(src).over(everything).alias(out_name))
    if cumsum_of is not None:
        off_cols.append(F.coalesce(F.sum("_s").over(prior), F.lit(0)).alias("_soff"))
    offsets = stats.select(*off_cols)

    joined = local.join(F.broadcast(offsets), "_rbkt")
    joined = joined.withColumn(
        rank_col, (F.col("_off") + F.col("_lrank")).cast("long")
    )
    if cumsum_of is not None:
        joined = joined.withColumn(cumsum_col, F.col("_soff") + F.col("_lcum"))
    drop = ["_rbkt", "_lrank", "_off"] + (
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
