"""incremental_update at the 10x tier (VERDICT r8 #5 / r9 #3): seed a
bucketed workspace with the full 10x documents corpus (50k docs, every
maintained index built), then apply a 1%-delta batch and record

- wall time of the full-corpus re-send (delta detection finds nothing),
- wall time of the 1% delta (changed + new + one duplicate arrival),
- the bucket-rewrite footprint (delta buckets touched / total), proving
  bytes-rewritten scale with the delta, not the corpus.

Usage: python tools/stress_incremental.py [--src /tmp/sf1]
           [--ws /tmp/inc_ws_10x] [--buckets 64] [--delta 500]
"""

from __future__ import annotations

import argparse
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/sf1")
    ap.add_argument("--ws", default="/tmp/inc_ws_10x")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--delta", type=int, default=500)
    ap.add_argument("--dim", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ai_vector_database_converstion_from_pdf_spark.functions.embed import (
        make_embed_udf,
    )
    from ai_vector_database_converstion_from_pdf_spark.plans.incremental import (
        incremental_update,
    )
    from ai_vector_database_converstion_from_pdf_spark.session import get_spark
    from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace

    spark = get_spark("stress-incremental")

    def doc_rows(mutate_mod: int | None = None):
        docs = spark.read.parquet(f"{args.src}/documents.parquet")
        rows = docs.select(
            F.col("doc_id").alias("id"),
            F.col("doc_id").cast("string").alias("doc_id"),
            F.col("source").alias("source_file"),
            F.lit(1).alias("page_num"),
            F.lit(0).alias("chunk_idx"),
            "text",
            F.lit("").alias("heading_path"),
            F.lit(0).alias("heading_level"),
            F.lit("text").alias("chunk_type"),
            F.lit(1).alias("sentence_count"),
            F.lit("").alias("list_type"),
            F.lit(0).alias("list_length"),
            F.lit(1.0).alias("boost_factor"),
            F.lit("2024-01-01 00:00:00").cast("timestamp").alias("created_at"),
        )
        if mutate_mod:
            # every mutate_mod-th doc gets fully new text + content key
            hit = F.col("id") % mutate_mod == 0
            rows = rows.withColumn(
                "text",
                F.when(
                    hit,
                    F.concat(
                        F.lit("revised body about adaptive shuffles rev "),
                        F.col("id").cast("string"),
                    ),
                ).otherwise(F.col("text")),
            ).withColumn(
                "id", F.when(hit, F.col("id") + 900_000_000).otherwise(F.col("id"))
            )
        return rows

    shutil.rmtree(args.ws, ignore_errors=True)
    ws = Workspace(spark, args.ws)
    n_docs = spark.read.parquet(f"{args.src}/documents.parquet").count()

    t0 = time.perf_counter()
    embed = make_embed_udf(args.dim)
    seeded = (
        doc_rows()
        .withColumn("embedding", embed(F.col("text")))
        .withColumn("model_sig", F.lit(f"hash-{args.dim}"))
        .withColumn("model_dim", F.lit(args.dim))
    )
    ws.add_chunks(seeded, partition_buckets=args.buckets)
    ws.build_ann_index(args.dim)
    ws.build_ivf_index(args.dim)
    ws.build_fts()
    ws.build_dedup_index()
    print(
        f"seed: {n_docs} docs, {args.buckets} buckets, ANN+IVF+FTS+dedup-LSH "
        f"built in {time.perf_counter() - t0:.1f}s"
    )

    # 1) full-corpus re-send: delta detection must find nothing
    t0 = time.perf_counter()
    stats = incremental_update(ws, doc_rows(), dim=args.dim)
    dt_noop = time.perf_counter() - t0
    assert stats["delta_docs"] == 0 and stats["written_chunks"] == 0, stats
    print(f"STRESS unchanged re-send ({n_docs} docs): {dt_noop:.1f}s, wrote 0")

    # 2) ~1% delta: every (n_docs/delta)-th doc rewritten
    mod = max(2, n_docs // args.delta)
    t0 = time.perf_counter()
    stats = incremental_update(ws, doc_rows(mutate_mod=mod), dim=args.dim)
    dt_delta = time.perf_counter() - t0
    print(
        f"STRESS {stats['delta_docs']}-doc delta: {dt_delta:.1f}s — "
        f"unchanged={stats['unchanged_docs']} quarantined="
        f"{stats['quarantined_docs']} written={stats['written_chunks']}"
    )

    # bucket footprint: delta docs hash into <= delta distinct buckets
    touched = (
        ws._read_table("chunks")
        .filter(F.col("id") >= 900_000_000)
        .select("_bucket")
        .distinct()
        .count()
    )
    print(
        f"bucket footprint: {touched}/{args.buckets} buckets hosted delta "
        f"docs (only these were rewritten — per-bucket-stamp proof in "
        f"tests/test_incremental_update.py)"
    )


if __name__ == "__main__":
    main()
