"""Winsorization and robust (median/MAD) anomaly detection."""

from ai_vector_database_converstion_from_pdf_spark.catalog import (
    events_robust_anomalies,
    events_value_winsorized,
)

from .conftest import SF_ORACLE


def test_winsorized_values_inside_band(spark):
    rows = events_value_winsorized(spark, SF_ORACLE).collect()
    assert rows
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for members in by_type.values():
        lo = min(m.value_w for m in members)
        hi = max(m.value_w for m in members)
        clipped = [m for m in members if m.clipped]
        unclipped = [m for m in members if not m.clipped]
        # clipping moved values INTO the band, never out of it
        assert all(lo <= m.value_w <= hi for m in members)
        assert all(m.value_w == m.value for m in unclipped)
        assert all(m.value_w in (lo, hi) for m in clipped)
        # ~10% of rows clip at [p5, p95]
        frac = len(clipped) / len(members)
        assert 0.02 < frac < 0.2


def test_robust_z_flags_flood_that_masks_classic_z(spark):
    """A single giant flood day: robust MAD flags it; the classic
    z-score is DILUTED by the flood inflating mean and stddev —
    the motivating failure mode for the median/MAD variant."""
    import math

    from pyspark.sql import Row

    rows = []
    day = 1
    for d in range(20):
        for _ in range(100 + (d % 7) * 3):  # jittered baseline ~100-118/day
            rows.append(Row(event_id=len(rows), ts=f"2024-01-{d+1:02d} 12:00:00",
                            user_id=1, event_type="click", value=1.0, props="{}"))
    for _ in range(3000):  # flood day
        rows.append(Row(event_id=len(rows), ts="2024-01-21 12:00:00",
                        user_id=1, event_type="click", value=1.0, props="{}"))
    import tempfile

    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/events.parquet")
        res = {str(r.day): r for r in events_robust_anomalies(spark, td).collect()}
    flood = [r for r in res.values() if r.cnt == 3000][0]
    assert flood.is_anomaly and flood.rz > 3
    normals = [r for r in res.values() if r.cnt < 200]
    assert all(not r.is_anomaly for r in normals)
    # classic z on the same series: flood inflates sd so much its own
    # z stays under ~4.6 (n=21, max possible (n-1)/sqrt(n) ~ 4.36)
    cnts = [r.cnt for r in res.values()]
    mean = sum(cnts) / len(cnts)
    sd = math.sqrt(sum((c - mean) ** 2 for c in cnts) / len(cnts))
    assert (3000 - mean) / sd < 4.6
    assert flood.rz > 100  # robust score is unambiguous


def test_robust_z_on_fixture_layout_invariant(spark):
    a = sorted(map(tuple, events_robust_anomalies(spark, SF_ORACLE).collect()))
    assert len(a) > 0
