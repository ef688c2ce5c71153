"""As-of join — a custom operator Spark lacks natively (the brief's
canonical example of composing one from built-ins).

Semantics: for each left row, attach the most recent right row with
right.ts <= left.ts within the same key (DuckDB/kdb ASOF JOIN, pandas
merge_asof backward).

Composition (no UDF): tag both sides, union, and take
last(right_value, ignorenulls) over a per-key window ordered by
(ts, side) with right rows sorting before left rows at equal ts (>=
semantics). One shuffle on the key; within a partition it is a single
ordered pass — the same cost profile as a sort-merge join, which is
exactly what a native as-of join would plan. The applyInPandas
merge_asof variant is unnecessary: this form stays entirely JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    right_value_col: str,
    out_col: str = "asof_value",
    direction: str = "backward",
) -> DataFrame:
    """Left rows + `out_col` = matched right value (null if none).
    Column sets of left are preserved.

    direction (pandas merge_asof semantics, inclusive on both sides):
      * "backward": most recent right row with right.ts <= left.ts
      * "forward":  earliest right row with right.ts >= left.ts
      * "nearest":  whichever of the two is closer in time; exact ties
        go BACKWARD (pandas' documented tie rule)

    All three stay one shuffle on the key: forward is the same ordered
    pass with the window direction flipped; nearest unions the two
    matched frames' (value, ts) pairs and picks map-side — no second
    shuffle, the two windows share one (key, ts) sort order."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction: {direction!r}")

    lcols = left.columns
    l = (
        left.withColumn("_side", F.lit(1))
        .withColumn("_rv", F.lit(None).cast(right.schema[right_value_col].dataType))
        .withColumn("_rts", F.lit(None).cast(dict(left.dtypes)[ts_col]))
    )
    r = (
        right.select(key, ts_col, F.col(right_value_col).alias("_rv"))
        .withColumn("_side", F.lit(0))
        .withColumn("_rts", F.col(ts_col))
    )
    for c in lcols:
        if c not in (key, ts_col) and c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(l.dtypes)[c]))
    u = l.select(*lcols, "_side", "_rv", "_rts").unionByName(
        r.select(*lcols, "_side", "_rv", "_rts")
    )
    # at equal ts the right row must be visible to the left row in BOTH
    # directions (inclusive semantics): right (side 0) sorts before left
    # on each pass, and only the ts order flips between them
    wb = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col).desc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    if direction == "backward":
        matched = u.withColumn(out_col, F.last("_rv", ignorenulls=True).over(wb))
    elif direction == "forward":
        matched = u.withColumn(out_col, F.last("_rv", ignorenulls=True).over(wf))
    else:
        # both directions over ONE key-partitioned frame (two in-partition
        # sorts, one shuffle), then a map-side pick of the closer match
        matched = (
            u.withColumn("_bv", F.last("_rv", ignorenulls=True).over(wb))
            .withColumn("_bts", F.last("_rts", ignorenulls=True).over(wb))
            .withColumn("_fv", F.last("_rv", ignorenulls=True).over(wf))
            .withColumn("_fts", F.last("_rts", ignorenulls=True).over(wf))
        )
        bdelta = F.col(ts_col).cast("double") - F.col("_bts").cast("double")
        fdelta = F.col("_fts").cast("double") - F.col(ts_col).cast("double")
        pick_b = F.col("_fts").isNull() | (
            F.col("_bts").isNotNull() & (bdelta <= fdelta)
        )
        matched = matched.withColumn(
            out_col, F.when(pick_b, F.col("_bv")).otherwise(F.col("_fv"))
        )
    return matched.filter(F.col("_side") == 1).select(*lcols, out_col)
