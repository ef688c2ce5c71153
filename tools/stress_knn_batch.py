"""Eval-scale batch k-NN stress (r13, VERDICT r12 #4): 10k query
vectors against the 10x corpus through `knn_join(method="auto")` — the
broadcast-budget probe must flip to the blocked query×corpus GEMM plan,
and a seeded query sample must match the exact single-query brute-force
path per-query, byte-for-byte.

The former ceiling anywhere in the suite was 20 queries
(retrieval_eval_labels); real retrieval evals and hard-negative-mining
pipelines run 10⁴-10⁵ queries, which is the consumer this plan exists
for.

Usage: python tools/stress_knn_batch.py [--src /tmp/sf1]
           [--n-queries 10000] [--k 10] [--parity-sample 25]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/sf1")
    ap.add_argument("--n-queries", type=int, default=10_000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--parity-sample", type=int, default=25)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ai_vector_database_converstion_from_pdf_spark.operators import semantic
    from ai_vector_database_converstion_from_pdf_spark.session import get_spark

    spark = get_spark("stress-knn-batch")
    emb = spark.read.parquet(f"{args.src}/embeddings.parquet").persist()
    n_corpus = emb.count()
    # deterministic query set: the n xxhash64-smallest corpus vectors
    # (spread across the id space, not the first contiguous block)
    queries = (
        emb.orderBy(
            F.xxhash64(F.col("vec_id").cast("string")).asc(),
            F.col("vec_id").asc(),
        )
        .limit(args.n_queries)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
        .localCheckpoint(eager=True)
    )
    nq = queries.count()
    print(f"corpus {n_corpus} vectors, {nq} queries, k={args.k}")

    t0 = time.time()
    out = semantic.knn_join(
        queries, emb, args.k, method="auto", n_queries=nq
    ).persist()
    n_out = out.count()
    wall = time.time() - t0
    assert n_out == nq * args.k, (n_out, nq * args.k)
    print(f"blocked auto path: {wall:.1f} s, {n_out} result rows")

    # per-query parity vs the exact single-query brute path on a seeded
    # sample of queries
    sample = [r["q_id"] for r in queries.limit(args.parity_sample).collect()]
    qmap = {
        r["q_id"]: list(r["q_vec"])
        for r in queries.filter(F.col("q_id").isin(sample)).collect()
    }
    t1 = time.time()
    mismatches = 0
    for qid in sample:
        exact = [
            (int(r["vec_id"]), float(r["score"]))
            for r in semantic.semantic_topk(
                emb, qmap[qid], k=args.k
            ).collect()
        ]
        got = [
            (int(r["vec_id"]), float(r["score"]))
            for r in out.filter(F.col("q_id") == qid)
            .orderBy("knn_rank")
            .collect()
        ]
        if exact != got:
            mismatches += 1
            print(f"  MISMATCH q={qid}: exact={exact[:3]} got={got[:3]}")
    parity_wall = time.time() - t1
    assert mismatches == 0, f"{mismatches} per-query mismatches"
    print(
        f"parity: {len(sample)}/{len(sample)} sampled queries byte-equal "
        f"to the exact single-query path ({parity_wall:.1f} s)"
    )
    print(
        json.dumps(
            {
                "metric": "knn_batch_stress",
                "corpus": n_corpus,
                "n_queries": nq,
                "k": args.k,
                "wall_sec": round(wall, 1),
                "parity_sample": len(sample),
                "parity_ok": True,
            }
        )
    )


if __name__ == "__main__":
    main()
