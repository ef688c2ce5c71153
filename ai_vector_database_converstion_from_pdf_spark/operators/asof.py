"""As-of join — a custom operator Spark lacks natively (the brief's
canonical example of composing one from built-ins).

Semantics: for each left row, attach the matched right ROW's value
within the same key (DuckDB/kdb ASOF JOIN, pandas merge_asof), in any
of the three pandas directions.

Composition (no UDF): tag both sides, union, and take
last(struct(ts, value), ignorenulls) over a per-key window ordered by
(ts, side) with right rows sorting before left rows at equal ts
(inclusive semantics). The STRUCT is the unit of matching — the
matched timestamp and value always come from the SAME right row, even
when right values are null (a null value is a legitimate payload, not
"no match" — exactly DuckDB ASOF's row semantics). One shuffle on the
key; within a partition it is a single ordered pass — the same cost
profile as a sort-merge join, which is exactly what a native as-of
join would plan. The applyInPandas merge_asof variant is unnecessary:
this form stays entirely JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _seconds(col: F.Column, dtype: str) -> F.Column:
    """Timestamp-ish column -> double seconds for delta comparison.
    DATE casts to double as NULL in Spark, so route it via timestamp;
    numeric ts columns (epoch ints in tests) cast directly."""
    if dtype in ("date",) or dtype.startswith("timestamp"):
        return col.cast("timestamp").cast("double")
    return col.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    right_value_col: str,
    out_col: str = "asof_value",
    direction: str = "backward",
) -> DataFrame:
    """Left rows + `out_col` = matched right row's value (null if no
    right row matches — or if the matched row's value is null). Column
    sets of left are preserved.

    direction (pandas merge_asof semantics, inclusive on both sides):
      * "backward": most recent right row with right.ts <= left.ts
      * "forward":  earliest right row with right.ts >= left.ts
      * "nearest":  whichever of the two is closer in time; exact ties
        go BACKWARD (pandas' documented tie rule)

    All three stay one shuffle on the key: forward is the same ordered
    pass with the window direction flipped; nearest computes both
    matches over ONE key-partitioned frame (two in-partition sorts
    sharing the exchange) and picks the closer match map-side."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction: {direction!r}")

    lcols = left.columns
    ts_type = dict(left.dtypes)[ts_col]
    # the match unit: a struct of (right ts, right value), null on left
    # rows — last(_m, ignorenulls) can then never pair a timestamp with
    # a value from a DIFFERENT right row
    l = left.withColumn("_side", F.lit(1)).withColumn(
        "_m",
        F.lit(None).cast(
            f"struct<ts:{ts_type},v:{right.schema[right_value_col].dataType.simpleString()}>"
        ),
    )
    r = (
        right.select(key, ts_col, F.col(right_value_col).alias("_v"))
        .withColumn("_side", F.lit(0))
        .withColumn(
            "_m", F.struct(F.col(ts_col).alias("ts"), F.col("_v").alias("v"))
        )
        .drop("_v")
    )
    for c in lcols:
        if c not in (key, ts_col) and c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(l.dtypes)[c]))
    u = l.select(*lcols, "_side", "_m").unionByName(r.select(*lcols, "_side", "_m"))
    # at equal ts the right row must be visible to the left row in BOTH
    # directions (inclusive semantics): right (side 0) sorts before left
    # on each pass, and only the ts order flips between them. The match
    # struct itself is the tertiary key: when SEVERAL right rows share
    # (key, ts) the winner would otherwise be partition-order-dependent;
    # ordering by _m makes both directions deterministically pick the
    # max (ts, value) struct among the tied rows, run-to-run and
    # layout-independent. (_m is NULL on left rows, whose relative order
    # never matters — they carry no match.)
    wb = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col("_m").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col).desc(), F.col("_side").asc(), F.col("_m").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    if direction == "backward":
        matched = u.withColumn(
            out_col, F.last("_m", ignorenulls=True).over(wb)["v"]
        )
    elif direction == "forward":
        matched = u.withColumn(
            out_col, F.last("_m", ignorenulls=True).over(wf)["v"]
        )
    else:
        matched = (
            u.withColumn("_b", F.last("_m", ignorenulls=True).over(wb))
            .withColumn("_f", F.last("_m", ignorenulls=True).over(wf))
        )
        here = _seconds(F.col(ts_col), ts_type)
        bdelta = here - _seconds(F.col("_b")["ts"], ts_type)
        fdelta = _seconds(F.col("_f")["ts"], ts_type) - here
        pick_b = F.col("_f").isNull() | (
            F.col("_b").isNotNull() & (bdelta <= fdelta)
        )
        matched = matched.withColumn(
            out_col, F.when(pick_b, F.col("_b")["v"]).otherwise(F.col("_f")["v"])
        )
    return matched.filter(F.col("_side") == 1).select(*lcols, out_col)
