"""SparkSession factory pinned for deterministic local runs.

Local mode is a single JVM; on a real cluster the same config applies per
executor. `spark.sql.shuffle.partitions` is sized to cores locally; at
100 TB you'd set it to ~2-3x total cores (or rely on AQE coalescing,
which is enabled here).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "pvdb-spark", cpus: int | str | None = None) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalescing policy — MEASURED A/B over the full 114-query
        # suite (OPTIMIZATION_r13.md): parallelismFirst=false (the
        # byte-derived policy the guide §2.2 suggests for shuffle-bound
        # jobs) coalesces small-BYTES but CPU-DENSE post-shuffle stages
        # (minhash md5+affine partial aggs, bloom verify probes,
        # containment intersects) to one task and costs 2-5 s each on
        # spine queries, while its task-overhead savings are noise-
        # level. Kept at Spark's default (true = floor at parallelism,
        # correct for compute-bound stages at any scale) with an env
        # override for byte-bound cluster workloads.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"),
        )
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_AQE_ADVISORY_SIZE", "64m"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_for_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable knobs to an externally provided session
    (the driver hands us its own SparkSession in `entry()`)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"),
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_AQE_ADVISORY_SIZE", "64m"),
        )
    except Exception:
        pass  # non-runtime-settable in some builds; harmless
    return spark
