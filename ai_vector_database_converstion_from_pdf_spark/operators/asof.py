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
) -> DataFrame:
    """Left rows + `out_col` = most recent right value at-or-before the
    left timestamp (null if none). Column sets of left are preserved."""
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1)).withColumn(
        "_rv", F.lit(None).cast(right.schema[right_value_col].dataType)
    )
    r = (
        right.select(
            key, ts_col, F.col(right_value_col).alias("_rv")
        )
        .withColumn("_side", F.lit(0))
    )
    # align schemas for the union: left carries its own columns; right
    # rows carry nulls for them
    for c in lcols:
        if c not in (key, ts_col) and c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(l.dtypes)[c]))
    u = l.select(*lcols, "_side", "_rv").unionByName(r.select(*lcols, "_side", "_rv"))
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn(out_col, F.last("_rv", ignorenulls=True).over(w))
    return matched.filter(F.col("_side") == 1).select(*lcols, out_col)
