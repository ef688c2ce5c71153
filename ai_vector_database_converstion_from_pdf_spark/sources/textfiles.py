"""Text-file document sources: JSONL and CSV into the canonical
`documents` shape (doc_id, text, lang, source, n_chars), with explicit
schemas and corrupt-record QUARANTINE instead of silent drop.

Reference analog: the reference's only non-PDF ingestion path is the
CSV export round-trip (`vector_store.cpp:657-671` writes; nothing reads
it back) — a large-scale corpus, though, overwhelmingly arrives as
JSONL/CSV shards, so the engine needs first-class readers.

Scale notes:
- schemas are EXPLICIT (never inferred): schema inference is a full
  extra pass over 100 TB and can silently drift between shards.
- PERMISSIVE mode with a `_corrupt_record` column: a bad line becomes a
  quarantine row, not a job failure and not a silent drop — at 100 TB
  some shards WILL be malformed, and the quarantine count is a data-
  quality signal (see operators/quality.py).
- readers are plain `spark.read` scans: line-splittable (JSONL and
  non-multiline CSV are splittable formats), so executors parallelize
  within large files; column pruning applies downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# canonical documents schema + the quarantine slot
_DOC_FIELDS = [
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
    StructField("source", StringType()),
]

DOC_JSONL_SCHEMA = StructType(_DOC_FIELDS + [StructField("_corrupt_record", StringType())])
DOC_CSV_SCHEMA = StructType(_DOC_FIELDS + [StructField("_corrupt_record", StringType())])


def _finish(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE read into (good, quarantined). Good rows get
    n_chars derived (never trusted from the file); quarantine keeps the
    raw line for forensics."""
    # Spark requires caching/materialization before filtering on
    # _corrupt_record alone (the column is populated at parse time);
    # referencing data columns alongside it is the supported pattern.
    bad = raw.filter(
        F.col("_corrupt_record").isNotNull() | F.col("doc_id").isNull()
    ).select(F.col("_corrupt_record").alias("raw_line"))
    good = (
        raw.filter(F.col("_corrupt_record").isNull() & F.col("doc_id").isNotNull())
        .drop("_corrupt_record")
        .withColumn("n_chars", F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long"))
    )
    return good, bad


def read_documents_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine) from JSON-lines shards. One scan, splittable,
    explicit schema, malformed lines quarantined not dropped."""
    raw = (
        spark.read.schema(DOC_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return _finish(raw)


def read_documents_csv(
    spark: SparkSession, path: str, header: bool = True
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine) from CSV shards (quote-doubling dialect, the
    reference's own export format `vector_store.cpp:665-667`)."""
    raw = (
        spark.read.schema(DOC_CSV_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("header", str(header).lower())
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )
    return _finish(raw)
