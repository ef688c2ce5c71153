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
