"""Z-order clustering: key correctness and the actual data-skipping
payoff measured from real parquet row-group min/max stats."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from ai_vector_database_converstion_from_pdf_spark.functions.zorder import (
    zorder_cluster,
    zorder_key,
)
from ai_vector_database_converstion_from_pdf_spark.sources.tables import load_events

from .conftest import SF_ORACLE


def _interleave(x, y, bits=16):
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_key_matches_reference_bit_math(spark):
    df = spark.createDataFrame(
        [(a, b) for a in (0, 1, 5, 255, 70000) for b in (0, 3, 64, 65535)],
        "a long, b long",
    )
    rows = df.select(
        "a", "b", zorder_key([F.col("a"), F.col("b")], 16).alias("z")
    ).collect()
    for r in rows:
        assert r.z == _interleave(r.a & 0xFFFF, r.b & 0xFFFF)


def _overlap_fraction(files, col, lo, hi):
    """Fraction of row groups whose [min,max] for `col` intersects
    [lo, hi] — i.e. the groups a stats-pruning scan must read."""
    touched = total = 0
    for f in files:
        meta = pq.ParquetFile(f).metadata
        for g in range(meta.num_row_groups):
            rg = meta.row_group(g)
            for c in range(rg.num_columns):
                cc = rg.column(c)
                if cc.path_in_schema == col:
                    total += 1
                    st = cc.statistics
                    if st is None or (st.min <= hi and st.max >= lo):
                        touched += 1
    assert total > 0
    return touched / total


def test_zorder_skips_on_both_dimensions(spark, tmp_path):
    ev = load_events(spark, SF_ORACLE).select(
        "event_id",
        "user_id",
        F.floor(F.col("ts").cast("double") / 86400).cast("long").alias("day"),
    )
    lin_dir, z_dir = str(tmp_path / "linear"), str(tmp_path / "zorder")
    n_parts = 16
    # linear baseline: sorted by user_id only
    (
        ev.repartitionByRange(n_parts, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lin_dir)
    )
    zorder_cluster(
        ev, [F.col("user_id"), F.col("day")], n_parts
    ).write.mode("overwrite").parquet(z_dir)
    lin = glob.glob(f"{lin_dir}/*.parquet")
    zed = glob.glob(f"{z_dir}/*.parquet")

    users = [r.user_id for r in ev.select("user_id").distinct().collect()]
    days = [r.day for r in ev.select("day").distinct().collect()]
    u_lo = sorted(users)[0]
    u_hi = sorted(users)[max(0, len(users) // 20 - 1)]  # ~5% of users
    d_lo = sorted(days)[0]
    d_hi = sorted(days)[max(0, len(days) // 10 - 1)]  # ~10% of days

    # the linear layout prunes user_id perfectly but cannot prune day
    assert _overlap_fraction(lin, "user_id", u_lo, u_hi) < 0.35
    assert _overlap_fraction(lin, "day", d_lo, d_hi) > 0.95
    # the z-ordered layout prunes meaningfully on BOTH dimensions
    zu = _overlap_fraction(zed, "user_id", u_lo, u_hi)
    zd = _overlap_fraction(zed, "day", d_lo, d_hi)
    assert zu < 0.6, zu
    assert zd < 0.6, zd


def test_cluster_preserves_rows(spark):
    ev = load_events(spark, SF_ORACLE).select("event_id", "user_id")
    out = zorder_cluster(ev, [F.col("user_id"), F.col("event_id")], 8)
    assert out.count() == ev.count()
    assert sorted(r.event_id for r in out.select("event_id").collect()) == sorted(
        r.event_id for r in ev.select("event_id").collect()
    )
