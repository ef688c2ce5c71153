"""Approximate sketch aggregates vs their exact anchors: HLL++ distinct
counts and KLL-style approx percentiles must land inside their
documented error envelopes on the fixture (the 100 TB substitutes for
exact distinct/percentile; rows-only in the catalog by design)."""

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def test_sketches_within_error_bounds(spark):
    from ai_vector_database_converstion_from_pdf_spark.catalog import (
        events_approx_sketches,
    )
    from ai_vector_database_converstion_from_pdf_spark.sources.tables import (
        load_events,
    )

    approx = {
        r["event_type"]: r for r in events_approx_sketches(spark, SF_ORACLE).collect()
    }
    ev = load_events(spark, SF_ORACLE)
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5D)").alias("p50"),
            F.expr("percentile(value, 0.95D)").alias("p95"),
        )
        .collect()
    }
    assert set(approx) == set(exact) and len(approx) == 5
    for et, a in approx.items():
        e = exact[et]
        # HLL++ at rsd=0.02: allow 3 sigma
        assert abs(a["approx_users"] - e["users"]) <= max(3, 0.06 * e["users"])
        # approx_percentile(accuracy=10000): rank error <= n/10000 — on
        # this fixture effectively exact-ish; allow 2% of the value range
        lo, hi = ev.agg(F.min("value"), F.max("value")).first()
        tol = 0.02 * (hi - lo)
        assert abs(a["approx_p50"] - e["p50"]) <= tol
        assert abs(a["approx_p95"] - e["p95"]) <= tol


def test_hll_incremental_rollup_merge_is_lossless(spark):
    """Union of per-day HLL partials must equal the direct whole-range
    sketch estimate (same lgConfigK ⇒ identical register state), and
    land inside the HLL error envelope of the exact distinct count."""
    from ai_vector_database_converstion_from_pdf_spark.catalog import (
        events_hll_incremental_rollup,
    )
    from ai_vector_database_converstion_from_pdf_spark.sources.tables import (
        load_events,
    )

    merged = {
        r["event_type"]: r
        for r in events_hll_incremental_rollup(spark, SF_ORACLE).collect()
    }
    ev = load_events(spark, SF_ORACLE)
    direct = {
        r["event_type"]: r["est"]
        for r in ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("est")
        )
        .collect()
    }
    exact = {
        r["event_type"]: r["users"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("users"))
        .collect()
    }
    totals = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert set(merged) == set(direct) == set(exact)
    for et, row in merged.items():
        assert row["approx_users_merged"] == direct[et]  # lossless merge
        assert abs(row["approx_users_merged"] - exact[et]) <= max(
            3, 0.05 * exact[et]
        )
        assert row["n_events"] == totals[et]
        assert row["n_days"] == 30
