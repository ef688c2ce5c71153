"""Streaming exact dedup: the first occurrence of a content hash wins
across micro-batches (state-store membership), dups are tagged with
their keeper, and the kept set equals the batch exact_dedup recompute."""

import glob
import shutil

from pyspark.sql import functions as F


def _write_two_drops(spark, tmp_path, rows_a, rows_b):
    path = str(tmp_path / "docs_drops")
    schema = "doc_id long, text string"
    spark.createDataFrame(rows_a, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    tmp2 = str(tmp_path / "drop2")
    spark.createDataFrame(rows_b, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp2)
    for i, f in enumerate(glob.glob(f"{tmp2}/part-*.parquet")):
        shutil.copy(f, f"{path}/zz-second-{i}.parquet")
    return path


def test_streaming_dedup_across_batches(spark, tmp_path):
    from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
        exact_dedup,
    )
    from ai_vector_database_converstion_from_pdf_spark.streaming.ingest_stream import (
        streaming_exact_dedup,
    )

    # batch 1: ids 0-5 with dup contents inside the batch
    rows_a = [(0, "alpha"), (1, "beta"), (2, "Alpha "), (3, "gamma"), (4, "beta"), (5, "delta")]
    # batch 2: re-sends of batch-1 content (cross-batch dups) + new docs
    rows_b = [(6, "alpha"), (7, "epsilon"), (8, "GAMMA"), (9, "zeta")]
    path = _write_two_drops(spark, tmp_path, rows_a, rows_b)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = streaming_exact_dedup(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sdedup")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {r["id"]: r for r in spark.sql("select * from sdedup").collect()}
    assert len(got) == 10  # every row tagged, none silently dropped

    # normalized-content equivalence: 'alpha' == 'Alpha ' (norm_text)
    firsts = sorted(i for i, r in got.items() if r["is_first"])
    assert firsts == [0, 1, 3, 5, 7, 9]
    # cross-batch dup points at the batch-1 keeper
    assert got[6]["dup_of"] == 0 and not got[6]["is_first"]
    assert got[8]["dup_of"] == 3
    # in-batch dups resolved to min id
    assert got[2]["dup_of"] == 0
    assert got[4]["dup_of"] == 1

    # kept set == batch recompute keepers
    all_docs = spark.createDataFrame(
        [(i, t) for i, t in
         [(0, "alpha"), (1, "beta"), (2, "Alpha "), (3, "gamma"), (4, "beta"),
          (5, "delta"), (6, "alpha"), (7, "epsilon"), (8, "GAMMA"), (9, "zeta")]],
        "doc_id long, text string",
    )
    batch_keepers = sorted(
        r["keeper_id"] for r in exact_dedup(all_docs).collect()
    )
    assert firsts == batch_keepers
