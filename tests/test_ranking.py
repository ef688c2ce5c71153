"""Distributed exact global rank (operators/ranking.py): value-based
breakpoint bucketing must reproduce row_number()/ntile()/running-sum
over a global ORDER BY exactly — including on inputs whose partition
layout is nondeterministic across job executions (the failure mode that
killed the spark_partition_id variant: range-sampler boundaries drifted
between the offsets job and the final job, producing 48,631 distinct
"ranks" for 50,000 rows)."""

from pyspark.sql import Window, functions as F

from ai_vector_database_converstion_from_pdf_spark.operators.ranking import (
    ntile_from_rank,
    with_global_rank,
)


def _tie_heavy(spark, n=20000, nparts=32):
    # crossJoin forces a nondeterministic physical row order per
    # partition — the stressing input shape
    base = spark.range(n // 10).select(F.col("id").alias("lo"))
    reps = spark.range(10).select(F.col("id").alias("rep"))
    return base.crossJoin(reps).select(
        (F.col("lo") + F.col("rep") * 1_000_000).alias("doc_id"),
        (F.col("lo") % 37).alias("key"),
    ).repartition(nparts)


def test_rank_matches_global_row_number(spark):
    df = _tie_heavy(spark)
    got = {
        r["doc_id"]: r["rnk"]
        for r in with_global_rank(df, [("key", "asc"), ("doc_id", "asc")]).collect()
    }
    rows = sorted((r["key"], r["doc_id"]) for r in df.collect())
    for want, (_, doc) in enumerate(rows, 1):
        assert got[doc] == want, (doc, got[doc], want)


def test_rank_desc_and_cumsum_match_window(spark):
    df = _tie_heavy(spark, n=5000, nparts=16).groupBy("key").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = Window.orderBy(F.desc("n_events"), F.asc("key"))
    want = {
        (r["key"]): (r["rn"], r["cs"])
        for r in df.select(
            "key",
            F.row_number().over(w).alias("rn"),
            F.sum("n_events")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("cs"),
        ).collect()
    }
    got = {
        r["key"]: (r["rnk"], r["cum"])
        for r in with_global_rank(
            df,
            [("n_events", "desc"), ("key", "asc")],
            cumsum_of="n_events",
            cumsum_col="cum",
        ).collect()
    }
    assert got == want


def test_ranks_stable_across_repeated_jobs(spark):
    """The regression: every action over the ranked frame recomputes the
    lineage; the bucket assignment must be identical each time, so
    ranks stay a permutation of 1..N on every execution."""
    df = _tie_heavy(spark)
    n = df.count()
    ranked = with_global_rank(df, [("key", "asc"), ("doc_id", "asc")])
    for _ in range(3):
        s = ranked.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("rnk").alias("d"),
            F.min("rnk").alias("mn"),
            F.max("rnk").alias("mx"),
        ).first()
        assert (s["n"], s["d"], s["mn"], s["mx"]) == (n, n, 1, n)


def test_ntile_from_rank_matches_sql_ntile(spark):
    for n_rows, n_buckets in ((17, 4), (40, 4), (7, 10)):
        df = spark.range(n_rows).select(F.col("id"))
        w = Window.orderBy("id")
        want = [
            (r["id"], r["nt"])
            for r in df.select("id", F.ntile(n_buckets).over(w).alias("nt")).collect()
        ]
        total = F.lit(n_rows)
        got = [
            (r["id"], r["nt"])
            for r in df.select(
                "id",
                ntile_from_rank(F.col("id") + 1, total, n_buckets).alias("nt"),
            )
            .orderBy("id")
            .collect()
        ]
        assert got == sorted(want)


def test_totals_ride_along(spark):
    df = _tie_heavy(spark, n=1000, nparts=8)
    out = with_global_rank(
        df,
        [("key", "asc"), ("doc_id", "asc")],
        cumsum_of="key",
        total_cols={"n_total": "count", "key_total": "sum"},
    )
    row = out.limit(1).collect()[0]
    assert row["n_total"] == 1000
    want_sum = df.agg(F.sum("key")).first()[0]
    assert row["key_total"] == want_sum
