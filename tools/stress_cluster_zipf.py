"""Cluster-path near-dup on Zipf-sized clusters at the 10x tier (r13,
VERDICT r12 #5): recall/wall vs the balanced-cluster shape, with the
natural-k override + k-means++ seeding in play and the Σc² degeneracy
probe's verdict logged.

Runs threshold-0.8 near-dup pair enumeration on a clustered 10x
fixture (balanced: /tmp/sfclu10; zipf: /tmp/sfclu10z) three ways:
exact blocked GEMM (ground truth), method="cluster", method="lsh" —
and reports recall + wall + false positives for the approximate paths.

Usage: python tools/stress_cluster_zipf.py [--src /tmp/sfclu10z]
           [--threshold 0.8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/sfclu10z")
    ap.add_argument("--threshold", type=float, default=0.8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )
    from ai_vector_database_converstion_from_pdf_spark.session import get_spark

    spark = get_spark("stress-cluster-zipf")
    emb = (
        spark.read.parquet(f"{args.src}/embeddings.parquet")
        .repartition(int(spark.sparkContext.defaultParallelism))
        .persist()
    )
    n = emb.count()
    print(f"{args.src}: {n} vectors, τ={args.threshold}")

    t0 = time.time()
    exact = embedding_near_dup_pairs(
        emb, args.threshold, method="gemm", recall_sample=0
    ).persist()
    n_exact = exact.count()
    t_exact = time.time() - t0
    print(f"exact GEMM: {t_exact:.1f} s, {n_exact} pairs")

    out = {"src": args.src, "n": n, "exact_pairs": n_exact,
           "exact_wall": round(t_exact, 1)}
    for m in ("cluster", "lsh"):
        t0 = time.time()
        got = embedding_near_dup_pairs(
            emb, args.threshold, method=m, allow_dense_output=True
        ).persist()
        n_got = got.count()
        wall = time.time() - t0
        hits = got.join(
            exact.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi"
        ).count()
        recall = hits / n_exact if n_exact else 1.0
        fp = n_got - hits
        print(f"{m}: {wall:.1f} s, recall {recall:.3f}, {fp} false pos")
        out[m] = {"wall": round(wall, 1), "recall": round(recall, 3),
                  "false_pos": fp}
        got.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
