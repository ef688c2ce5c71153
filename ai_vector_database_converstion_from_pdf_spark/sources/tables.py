"""Parquet fixture readers (reference analog: the SQLite table scans in
`vector_store.cpp:206-252`; here a columnar Parquet scan with Catalyst
predicate pushdown + column pruning, which the reference lacks entirely).

At 100 TB these tables would be written partitioned (documents/chunks by
a hash-bucket of doc_id, events by date) — readers stay identical because
partition pruning is a storage-layout concern Catalyst handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    picked = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in picked}


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Some generations of events.parquet store TIMESTAMP(NANOS), which
    vanilla Spark readers reject; for those, read nanos as long (legacy
    conf, runtime-settable) and surface `ts` as TimestampType truncated to
    microseconds — the same nanos→micros truncation DuckDB applies on
    read, so epoch arithmetic is bit-identical across engines. Fixtures
    written with micros timestamps pass through untouched."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(df.schema["ts"].dataType, TimestampNTZType):
        # NTZ parquet under a UTC session: same instant, but NTZ can't be
        # cast to epoch doubles downstream — normalize to TimestampType.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
