"""Data-quality checks must FIRE on planted violations (the oracle entry
only proves zeros on healthy fixtures)."""

from pyspark.sql import functions as F


def test_quality_checks_fire_on_planted_violations(spark):
    from ai_vector_database_converstion_from_pdf_spark.operators.quality import (
        quality_report,
    )

    orders = spark.createDataFrame(
        [(1, "O"), (1, "F"), (2, "XX"), (3, "P")],  # dup PK + bad status
        "o_orderkey long, o_orderstatus string",
    )
    # orderkeys 99/98 are orphans; discounts 1.5 and -0.1 out of range
    lineitem = spark.createDataFrame(
        [(1, 0.05), (99, 0.5), (98, 1.5), (2, -0.1)],
        "l_orderkey long, l_discount double",
    )
    documents = spark.createDataFrame(
        [(1, "ok"), (2, None)], "doc_id long, text string"
    )
    events = spark.createDataFrame(
        [(1,), (2,)], "event_id long"
    ).select(
        "event_id",
        F.when(F.col("event_id") == 1, F.lit("2024-01-15 00:00:00"))
        .otherwise(F.lit("2025-06-01 00:00:00"))
        .cast("timestamp")
        .alias("ts"),
    )
    got = {
        r["check"]: r["n_violations"]
        for r in quality_report(spark, orders, lineitem, documents, events).collect()
    }
    assert got["unique_pk"] == 1          # orderkey 1 twice
    assert got["not_null_text"] == 1
    assert got["accepted_values_status"] == 1   # 'XX'
    assert got["range_discount"] == 2     # 1.5 and -0.1
    assert got["fk_lineitem_orders"] == 2  # 99, 98
    assert got["ts_domain"] == 1          # the 2025 event


def test_embedding_quality_detects_planted_defects(spark):
    """Plant every defect class the vector QA reports and check counts:
    a NULL vector, a NaN component, an off-dimension vector, a zero
    vector — each flagged exactly once; clean rows set the norm stats."""
    from ai_vector_database_converstion_from_pdf_spark.operators.quality import (
        embedding_quality,
    )

    rows = [
        (1, [3.0, 4.0]),          # norm 5
        (2, [0.6, 0.8]),          # norm 1
        (3, None),                # null
        (4, [float("nan"), 1.0]), # nan
        (5, [1.0, 2.0, 2.0]),     # off-dim (modal dim = 2)
        (6, [0.0, 0.0]),          # zero norm
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["metric"]: r["value"] for r in embedding_quality(emb).collect()}
    assert got["n_vectors"] == 6.0
    assert got["n_null"] == 1.0
    assert got["n_nan"] == 1.0
    assert got["n_offdim"] == 1.0
    assert got["n_zero_norm"] == 1.0
    # norms: [5, 1, nan-propagated?, 3, 0] — NaN rows poison avg; the
    # report's job is the counts, but p50 must be finite over the rest
    assert got["norm_p50"] is not None
