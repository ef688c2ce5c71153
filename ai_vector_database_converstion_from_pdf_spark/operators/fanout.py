"""Conditional fan-out for CPU-dense stages fed by under-split scans.

Guide §2.5 ("input skew: one huge unsplittable file … otherwise
repartition immediately after the read"): when a source provides fewer
splits than the cluster has cores, every per-row-expensive stage built
on it (tokenize + explode + hash chains, minhash partial aggregates,
signature builds) serializes on those few tasks. `fan_out_scan` probes
the frame's ACTUAL partition count — no job, just plan→RDD conversion —
and round-robin repartitions to `defaultParallelism` only when the scan
is under-split.

Scale honesty: at production scale a columnar table yields thousands of
row-group splits, so the probe never fires and no exchange is added;
it fires exactly in the degenerate layouts (one gzip file, one tiny
row-group fixture, a single consolidated upstream output) where the
guide prescribes the repartition. The exchange it adds carries only the
columns the caller projected. Round-robin repartition is deterministic
under retries (sortBeforeRepartition is on by default, SPARK-23207).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out_scan(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Repartition `df` to the default parallelism iff its current plan
    yields fewer partitions — a no-op whenever the source is already
    split at least core-wide. SPARK_GRAFT_FANOUT=0 disables."""
    import os

    if os.environ.get("SPARK_GRAFT_FANOUT", "1") == "0":
        return df
    sc = df.sparkSession.sparkContext
    target = int(min_parallelism or sc.defaultParallelism)
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df
    return df.repartition(target) if cur < target else df
