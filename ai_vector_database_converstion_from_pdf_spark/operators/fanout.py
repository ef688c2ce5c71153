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


def fan_out_scan(
    df: DataFrame,
    min_parallelism: int | None = None,
    min_bytes: int | None = None,
) -> DataFrame:
    """Repartition `df` to the default parallelism iff its current plan
    yields fewer partitions — a no-op whenever the source is already
    split at least core-wide. SPARK_GRAFT_FANOUT=0 disables.

    `min_bytes` (r14): additionally skip the fan-out when the plan's
    estimated size is below this bound — read from the optimizer's
    statistics (file-size based for parquet scans; NO job). Measured
    basis (text_heavy_hitters, in-process env-toggle A/B ×5):
    fanning a 0.6 MB corpus LOSES 5/5 (the exchange + 32 tiny MG
    batches + the larger merged candidate set cost ~1 s against ~1.9 s
    of serial work), while a 2.3 MB corpus WINS 5/5 (10.3 → 5.9 s) —
    the serial CPU grows linearly with bytes but the fan-out overhead
    does not. SPARK_GRAFT_FANOUT_MIN_BYTES overrides the caller's
    bound; at production scale any real corpus clears it and the
    partition probe below decides alone."""
    import os

    if os.environ.get("SPARK_GRAFT_FANOUT", "1") == "0":
        return df
    env_min = os.environ.get("SPARK_GRAFT_FANOUT_MIN_BYTES")
    if env_min is not None:
        min_bytes = int(env_min)
    if min_bytes:
        try:
            est = int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        except Exception:
            est = None
        if est is not None and est < int(min_bytes):
            return df
    sc = df.sparkSession.sparkContext
    target = int(min_parallelism or sc.defaultParallelism)
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df
    return df.repartition(target) if cur < target else df
