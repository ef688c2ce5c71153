"""Scale DML stress: bucket-scoped MERGE/DELETE vs full rewrite.

Builds a bucketed workspace from the sf0.1 documents replicated 40x
with 25x-padded text (200k chunks, ~0.5 GB, 64 hash buckets) so data
volume — not fixed job overhead — dominates, then measures
single-document DML two ways:
- WALL TIME of merge_chunks / delete_doc / compact_boosts vs the
  round-1 alternative (full-table rewrite), and
- BYTES REWRITTEN vs table size — the deterministic scale claim:
  bucket-scoped DML touches ~1/64 of the table regardless of corpus
  size, so at 100 TB a one-doc update rewrites ~1.5 TB-worth of ONE
  bucket's files instead of the whole corpus (and with more buckets,
  proportionally less; bucket count is a layout knob).

Usage: python tools/stress_dml.py   (prints a table; writes under /tmp)
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from tools.fswalk import rewritten_bytes as _rewritten_bytes, snapshot as _snapshot

SF = "/root/testdata/sf0.1"
REPLICAS = 40
BUCKETS = 64


def main() -> None:
    from pyspark.sql import functions as F

    from ai_vector_database_converstion_from_pdf_spark.session import get_spark
    from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace

    spark = get_spark("stress_dml")
    root = tempfile.mkdtemp(prefix="dml_stress_")
    ws = Workspace(spark, f"{root}/ws")

    docs0 = spark.read.parquet(f"{SF}/documents.parquet")
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    const_emb = F.array(*[F.lit(float(j)) for j in range(16)])
    chunks = (
        docs0.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("id"),
            (F.col("doc_id") + F.col("rep") * 1_000_000).cast("string").alias("doc_id"),
            F.lit("stress").alias("source_file"),
            F.lit(1).alias("page_num"),
            F.lit(0).alias("chunk_idx"),
            F.concat_ws(" ", F.array_repeat(F.col("text"), 25)).alias("text"),
        )
        .withColumn("embedding", const_emb)
        .withColumn("model_sig", F.lit("const-16"))
        .withColumn("model_dim", F.lit(16))
        .withColumn("heading_path", F.lit(""))
        .withColumn("heading_level", F.lit(0))
        .withColumn("chunk_type", F.lit("text"))
        .withColumn("sentence_count", F.lit(1))
        .withColumn("list_type", F.lit(""))
        .withColumn("list_length", F.lit(0))
        .withColumn("boost_factor", F.lit(1.0))
        .withColumn("created_at", F.lit("2024-01-01 00:00:00").cast("timestamp"))
    )

    t0 = time.perf_counter()
    ws.add_chunks(chunks, partition_buckets=BUCKETS)
    n = ws.count()
    table = ws._tbl("chunks")
    total = sum(sz for sz, _mt in _snapshot(table).values())
    print(
        f"setup: {n} chunks / {total/1e6:.0f} MB into {BUCKETS} buckets  "
        f"{time.perf_counter()-t0:.1f}s"
    )

    # realistic update shape: the new version arrives as DATA (a fresh
    # ingest batch), not as a lazy plan over the table being merged
    schema = ws.chunks().drop("_bucket").schema
    upd_rows = [
        tuple(r[f.name] for f in schema.fields)
        for r in ws.chunks_for_doc("42").withColumn("text", F.lit("PATCHED")).collect()
    ]
    upd = spark.createDataFrame(upd_rows, schema)

    before = _snapshot(table)
    t0 = time.perf_counter()
    ws.merge_chunks(upd)
    t_merge = time.perf_counter() - t0
    b_merge = _rewritten_bytes(before, _snapshot(table))
    print(
        f"merge_chunks (1 doc):  {t_merge:5.2f}s  rewrote {b_merge/1e6:6.1f} MB "
        f"({100*b_merge/total:.1f}% of table)"
    )

    before = _snapshot(table)
    t0 = time.perf_counter()
    ws.delete_doc("1000042")
    t_del = time.perf_counter() - t0
    b_del = _rewritten_bytes(before, _snapshot(table))
    print(
        f"delete_doc (1 doc):    {t_del:5.2f}s  rewrote {b_del/1e6:6.1f} MB "
        f"({100*b_del/total:.1f}% of table)"
    )

    ws.boost_entry(42, 0.1)
    before = _snapshot(table)
    t0 = time.perf_counter()
    ws.compact_boosts()
    t_compact = time.perf_counter() - t0
    b_compact = _rewritten_bytes(before, _snapshot(table))
    print(
        f"compact_boosts:        {t_compact:5.2f}s  rewrote {b_compact/1e6:6.1f} MB "
        f"({100*b_compact/total:.1f}% of table)"
    )

    # ANN index maintenance (r3): with a persisted RP-LSH index, a
    # one-doc MERGE re-signs only that doc and swaps only its index
    # bucket — measured against the r2 alternative (drop + full rebuild)
    t0 = time.perf_counter()
    ws.build_ann_index(dim=16, n_planes=4, n_tables=8)
    t_build = time.perf_counter() - t0
    idx_table = ws._tbl("ann_lsh")
    idx_total = sum(sz for sz, _mt in _snapshot(idx_table).values())
    print(f"ann index build:       {t_build:5.2f}s  ({idx_total/1e6:.1f} MB index)")
    before_idx = _snapshot(idx_table)
    t0 = time.perf_counter()
    ws.merge_chunks(upd)
    t_merge_idx = time.perf_counter() - t0
    b_idx = _rewritten_bytes(before_idx, _snapshot(idx_table))
    print(
        f"merge w/ maintained index: {t_merge_idx:5.2f}s  index rewrote "
        f"{b_idx/1e6:6.2f} MB ({100*b_idx/max(idx_total,1):.1f}% of index; "
        f"rebuild would cost {t_build:.1f}s + full index write)"
    )

    # Continuous-aggregate rollup maintenance (r3): with the doc rollup
    # enabled, a one-doc MERGE rewrites only that doc's partials in its
    # bucket — measured against recomputing the rollup from scratch
    t0 = time.perf_counter()
    ws.enable_doc_rollup()
    t_ru_build = time.perf_counter() - t0
    ru_table = ws._tbl("doc_rollup")
    ru_total = sum(sz for sz, _mt in _snapshot(ru_table).values())
    print(f"doc rollup build:      {t_ru_build:5.2f}s  ({ru_total/1e6:.1f} MB rollup)")
    before_ru = _snapshot(ru_table)
    t0 = time.perf_counter()
    ws.merge_chunks(upd)
    t_merge_ru = time.perf_counter() - t0
    b_ru = _rewritten_bytes(before_ru, _snapshot(ru_table))
    print(
        f"merge w/ maintained rollup: {t_merge_ru:5.2f}s  rollup rewrote "
        f"{b_ru/1e6:6.2f} MB ({100*b_ru/max(ru_total,1):.1f}% of rollup; "
        f"rebuild would cost {t_ru_build:.1f}s — a corpus scan)"
    )

    t0 = time.perf_counter()
    ws._overwrite("chunks", ws.chunks(fold_boosts=False))
    t_full = time.perf_counter() - t0
    print(f"full rewrite (round-1 shape): {t_full:5.2f}s  rewrote {total/1e6:6.1f} MB (100%)")
    print(
        f"speedup vs full rewrite: merge {t_full/t_merge:.1f}x wall / "
        f"{total/max(b_merge,1):.0f}x bytes; delete {t_full/t_del:.1f}x / "
        f"{total/max(b_del,1):.0f}x; compact {t_full/t_compact:.1f}x / "
        f"{total/max(b_compact,1):.0f}x"
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
