"""Maintained-quotient arrival cost at the MIXED 100x tier (r13,
VERDICT r12 #6 Done criterion: "a stress row showing arrival cost
O(batch) at the 100x tier where a rebuild costs 195-650 s").

Seeds a bucketed workspace with the mixed-100x documents (500k docs,
~60% paraphrase-unique — collapse cannot trivialize it), builds ONLY
the quotient index (the graph family's input; the chunk-level pair
table is deliberately skipped — it is the expensive member artifact
the quotient exists to avoid), then times:

1. the full quotient build (the per-session cost every pre-r13 session
   paid whenever the corpus changed),
2. a 500-doc arrival batch (new content classes → incident band join),
3. a doc delete,
4. maintained == from-scratch rebuild parity for classes AND qedges
   after the traffic.

Usage: python tools/stress_quot_tier.py [--src /tmp/sf10mix]
           [--ws /tmp/quot_ws_100x] [--buckets 64] [--delta 500]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/sf10mix")
    ap.add_argument("--ws", default="/tmp/quot_ws_100x")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--delta", type=int, default=500)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ai_vector_database_converstion_from_pdf_spark.functions.text import (
        tokens,
    )
    from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
        exact_collapse_classes,
        simhash_pairs,
    )
    from ai_vector_database_converstion_from_pdf_spark.session import get_spark
    from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace

    spark = get_spark("stress-quot-tier")

    def doc_rows(df):
        return df.select(
            F.col("doc_id").alias("id"),
            F.col("doc_id").cast("string").alias("doc_id"),
            F.lit("mixed100x").alias("source_file"),
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
            F.array(*[F.lit(0.5)] * 4).cast("array<double>").alias("embedding"),
            F.lit("stub-4").alias("model_sig"),
            F.lit(4).alias("model_dim"),
        )

    shutil.rmtree(args.ws, ignore_errors=True)
    ws = Workspace(spark, args.ws)
    docs = spark.read.parquet(f"{args.src}/documents.parquet")
    n = docs.count()
    t0 = time.time()
    ws.add_chunks(doc_rows(docs), partition_buckets=args.buckets)
    t_seed = time.time() - t0
    print(f"seed: {n} docs in {t_seed:.1f}s ({args.buckets} buckets)")

    t0 = time.time()
    n_qe = ws.build_sim_quotient_index()
    t_build = time.time() - t0
    print(
        f"QUOTIENT BUILD: {t_build:.1f}s, {n_qe} class qedges — the "
        "per-corpus-change cost arrivals now avoid"
    )

    # arrival: delta new docs with genuinely new paraphrase-band content
    fresh = doc_rows(
        docs.limit(args.delta).select(
            (F.col("doc_id") + 900_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zqarrival batch marker")).alias(
                "text"
            ),
        )
    )
    t0 = time.time()
    ws.add_chunks(fresh, partition_buckets=args.buckets)
    t_arr = time.time() - t0
    print(
        f"ARRIVAL ({args.delta} docs): {t_arr:.1f}s — "
        f"{t_build / t_arr:.0f}x cheaper than the rebuild"
    )

    victim = str(docs.first()["doc_id"])
    t0 = time.time()
    ws.delete_doc(victim)
    t_del = time.time() - t0
    print(f"DELETE (1 doc): {t_del:.1f}s")

    # parity: maintained == from-scratch rebuild on the final corpus
    t0 = time.time()
    chunks_now = (
        ws.chunks(fold_boosts=False)
        .select("id", "text")
        .localCheckpoint(eager=True)  # unique lineage: simhash_pairs
        # persists its signatures and a same-plan rebuild would be
        # served stale from the cache manager (see test_quot_index)
    )
    cls_ref = (
        exact_collapse_classes(chunks_now, id_col="id", text_col="text")
        .filter(F.size(tokens(F.col("txt"))) >= 1)
        .localCheckpoint(eager=True)
    )
    reps_ref = cls_ref.select(
        F.col("rep").alias("id"), F.col("txt").alias("text")
    )
    qe_ref = simhash_pairs(
        reps_ref, max_hamming=3, id_col="id", text_col="text"
    ).select("id_a", "id_b")
    got_cls, got_qe = ws.sim_quotient_index()
    results = {}
    for name, maintained, rebuilt in (
        (
            "classes",
            got_cls.select("rep", "m"),
            cls_ref.select("rep", F.col("m").cast("long").alias("m")),
        ),
        ("qedges", got_qe, qe_ref),
    ):
        extra = maintained.exceptAll(rebuilt).count()
        missing = rebuilt.exceptAll(maintained).count()
        nrows = maintained.count()
        assert extra == 0 and missing == 0, (name, extra, missing)
        results[name] = nrows
        print(f"parity {name}: maintained == rebuild ({nrows} rows)")
    t_par = time.time() - t0
    print(f"(parity rebuild itself took {t_par:.1f}s)")
    print(
        json.dumps(
            {
                "metric": "quot_tier_stress",
                "docs": n,
                "build_sec": round(t_build, 1),
                "arrival_docs": args.delta,
                "arrival_sec": round(t_arr, 1),
                "delete_sec": round(t_del, 1),
                "qedges": results["qedges"],
                "classes": results["classes"],
                "parity_ok": True,
            }
        )
    )


if __name__ == "__main__":
    main()
