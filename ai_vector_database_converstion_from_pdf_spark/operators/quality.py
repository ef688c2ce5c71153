"""Declarative data-quality assertions (dbt-tests / Deequ analog).

A check is a (name, table, violation-count expression); the report is
one row per check with its violation count — 0 = healthy. Each check is
a single aggregate over one scan (or one anti-join for referential
integrity), so a full report over N tables is N scans with map-side
combines — the cheapest possible audit shape at 100 TB, and trivially
schedulable after every ingest batch.

Check families covered: primary-key uniqueness, not-null, accepted
values, numeric range, referential integrity (anti-join), and
freshness/time-domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _one(spark: SparkSession, check_id: int, check: str, table: str, n) -> DataFrame:
    return n.select(
        F.lit(check_id).alias("check_id"),
        F.lit(check).alias("check"),
        F.lit(table).alias("table_name"),
        # sum() over an empty table is NULL — an empty table has zero
        # violations, so every check is NULL-safe here
        F.coalesce(F.col("n").cast("long"), F.lit(0)).alias("n_violations"),
    )


def quality_report(
    spark: SparkSession,
    orders: DataFrame,
    lineitem: DataFrame,
    documents: DataFrame,
    events: DataFrame,
) -> DataFrame:
    """Fixture-schema quality suite; one row per check, ordered by id."""
    checks = [
        # 1. PK uniqueness: duplicate orderkeys
        _one(
            spark, 1, "unique_pk", "orders",
            orders.agg(
                (F.count("*") - F.count_distinct("o_orderkey")).alias("n")
            ),
        ),
        # 2. not-null text
        _one(
            spark, 2, "not_null_text", "documents",
            documents.agg(
                F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)).alias("n")
            ),
        ),
        # 3. accepted values
        _one(
            spark, 3, "accepted_values_status", "orders",
            orders.agg(
                F.sum(
                    F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
                ).alias("n")
            ),
        ),
        # 4. numeric range: discount in [0, 1]
        _one(
            spark, 4, "range_discount", "lineitem",
            lineitem.agg(
                F.sum(
                    F.when(
                        (F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1
                    ).otherwise(0)
                ).alias("n")
            ),
        ),
        # 5. referential integrity: lineitem -> orders
        _one(
            spark, 5, "fk_lineitem_orders", "lineitem",
            lineitem.join(
                orders.select("o_orderkey"),
                lineitem.l_orderkey == F.col("o_orderkey"),
                "left_anti",
            ).agg(F.count("*").alias("n")),
        ),
        # 6. time domain: events inside the fixture month
        _one(
            spark, 6, "ts_domain", "events",
            events.agg(
                F.sum(
                    F.when(
                        (F.col("ts") < F.lit("2024-01-01 00:00:00").cast("timestamp"))
                        | (F.col("ts") >= F.lit("2024-02-01 00:00:00").cast("timestamp")),
                        1,
                    ).otherwise(0)
                ).alias("n")
            ),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("check_id")


def embedding_quality(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """(metric, value) rows of vector-side QA: NULL / NaN / off-modal-
    dimension / zero-norm counts and norm stats. The I17 dimension
    guardrail (`vector_store.cpp:780-787`, enforced per-batch in
    sinks._guarded_batch_stats) generalized to a whole-corpus report.

    One aggregate pass over the table; the modal dimension comes from a
    tiny (distinct-dims)-sized pre-aggregate. Exact percentiles are the
    only sort-bearing aggregate — at 100 TB substitute approx_percentile
    (same shape, bounded memory)."""
    v = F.col(vec_col)
    mode_row = (
        emb.filter(v.isNotNull())
        .groupBy(F.size(v).alias("d"))
        .count()
        .orderBy(F.col("count").desc(), F.col("d").asc())
        .limit(1)
        .collect()
    )
    mode_dim = int(mode_row[0]["d"]) if mode_row else 0
    nrm = F.when(
        v.isNull(), F.lit(None).cast("double")
    ).otherwise(
        F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x.cast("double") * x))
    )
    has_nan = F.when(v.isNull(), F.lit(False)).otherwise(
        F.exists(v, lambda x: F.isnan(x))
    )
    offdim = F.when(v.isNull(), F.lit(False)).otherwise(
        F.size(v) != F.lit(mode_dim)
    )
    base = emb.select(
        v.isNull().alias("is_null"),
        nrm.alias("nrm"),
        has_nan.alias("has_nan"),
        offdim.alias("offdim"),
    )
    agg = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_vectors"),
        F.sum(F.when(F.col("is_null"), 1).otherwise(0)).cast("double").alias("n_null"),
        F.sum(F.when(F.col("has_nan"), 1).otherwise(0)).cast("double").alias("n_nan"),
        F.sum(F.when(F.col("offdim"), 1).otherwise(0)).cast("double").alias("n_offdim"),
        F.sum(F.when(F.col("nrm") == 0.0, 1).otherwise(0)).cast("double").alias("n_zero_norm"),
        F.round(F.avg("nrm"), 6).alias("mean_norm"),
        F.round(F.expr("percentile(nrm, 0.5D)"), 6).alias("norm_p50"),
        F.round(F.expr("percentile(nrm, 0.99D)"), 6).alias("norm_p99"),
    )
    metrics = [
        "mean_norm", "n_nan", "n_null", "n_offdim",
        "n_vectors", "n_zero_norm", "norm_p50", "norm_p99",
    ]
    stack = ", ".join(f"'{m}', {m}" for m in metrics)
    return agg.selectExpr(
        f"stack({len(metrics)}, {stack}) as (metric, value)"
    )


def source_psi(
    docs,
    bucket_width: int = 50,
    n_buckets: int = 20,
    group_col: str = "source",
    value_col: str = "n_chars",
):
    """Population Stability Index of each source's `value_col`
    distribution against the whole corpus — the standard drift metric
    for monitoring a multi-source ingest mix (PSI < 0.1 stable, 0.1-0.25
    drifting, > 0.25 shifted). Buckets are fixed-width with the last
    open-ended (deterministic — no quantile estimation), shares are
    Laplace-smoothed (+0.5 per bucket) so empty cells stay finite.

    Determinism contract: every per-bucket term is computed from exact
    integer counts with the identical op order in both engines, rounded
    to 6 and scaled to integer micro-units before the per-source sum —
    no float-accumulation-order drift.

    Scale shape: one (group, bucket) aggregate over the corpus (tiny
    output: sources x n_buckets), a bucket-domain cross join on that
    TINY aggregate (never on the corpus), map-side math after. Output:
    (source, n_docs, psi)."""
    from pyspark.sql import functions as F

    b = F.least(
        F.floor(F.col(value_col) / F.lit(int(bucket_width))),
        F.lit(int(n_buckets) - 1),
    ).cast("long")
    cells = (
        docs.select(F.col(group_col).alias("grp"), b.alias("b"))
        .groupBy("grp", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    groups = cells.groupBy("grp").agg(F.sum("c").alias("tot"))
    buckets = cells.groupBy("b").agg(F.sum("c").alias("gc"))
    grand = cells.agg(F.sum("c").alias("g"))
    domain = groups.crossJoin(F.broadcast(buckets)).crossJoin(
        F.broadcast(grand)
    )
    full = domain.join(cells, ["grp", "b"], "left").withColumn(
        "c", F.coalesce(F.col("c"), F.lit(0))
    )
    smooth = 0.5
    p = (F.col("c") + smooth) / (F.col("tot") + smooth * n_buckets)
    q = (F.col("gc") + smooth) / (F.col("g") + smooth * n_buckets)
    term = F.round((p - q) * F.log(p / q), 6)
    return (
        full.select(
            "grp",
            "tot",
            F.round(term * 1e6).cast("long").alias("ti"),
        )
        .groupBy("grp")
        .agg(
            F.max("tot").cast("long").alias("n_docs"),
            F.round(F.sum("ti") / 1e6, 6).alias("psi"),
        )
        .select(F.col("grp").alias(group_col), "n_docs", "psi")
    )
