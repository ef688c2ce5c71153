"""Mutual-kNN END-TO-END recall under the auto→cluster dispatch (r13,
VERDICT r12 #1 — "the one approximate consumer in the catalog whose
degradation has no number").

The catalog's mutual_knn_pairs at the 100x tier consumes cluster-path
candidates; the 0.917 figure measured for near-dup PAIR enumeration
does not transfer — a missed candidate shifts rank windows, and
mutuality compounds misses from both endpoints. This tool measures the
end product:

1. run the dispatched pipeline exactly as the catalog does
   (embedding_near_dup_pairs method="auto" at τ, then
   mutual_knn_pairs_from k) and time it;
2. build EXACT sampled ground truth: the τ-floored exact top-k of a
   seeded node sample via the blocked knn_join GEMM, then one more
   blocked pass over the sample's neighbor set, so (s, b) mutual iff
   b ∈ top-k(s) AND s ∈ top-k(b) under the operator's own ranking rule
   ((cos desc, id asc), cos rounded 6, neighbors below τ excluded —
   the documented candidate floor, applied to BOTH sides);
3. report recall = covered sampled exact-mutual pairs / all sampled
   exact-mutual pairs, plus the sampled precision of dispatched pairs
   incident to the sample.

Exact ground truth for the FULL corpus is deliberately out of reach
(τ=0.25 at the mixed tier implies an ~N²/40 pair set — the saturated
boundary the density gate exists for); the sample is the honest
instrument, same as the dispatch's own logged estimate.

Usage: python tools/stress_mutual_knn.py [--src /tmp/sf10mix]
           [--tau 0.25] [--k 3] [--samples 200]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/sf10mix")
    ap.add_argument("--tau", type=float, default=0.25)
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--samples", type=int, default=200)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ai_vector_database_converstion_from_pdf_spark.operators import semantic
    from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )
    from ai_vector_database_converstion_from_pdf_spark.operators.similarity import (
        mutual_knn_pairs_from,
    )
    from ai_vector_database_converstion_from_pdf_spark.session import get_spark

    spark = get_spark("stress-mutual-knn")
    emb = spark.read.parquet(f"{args.src}/embeddings.parquet").persist()
    n = emb.count()
    d = len(emb.select("embedding").first()[0])
    print(f"corpus {n} vectors dim {d}, τ={args.tau}, k={args.k}")

    # 1) the dispatched pipeline, timed — exactly the catalog recipe
    t0 = time.time()
    pairs = embedding_near_dup_pairs(
        emb,
        threshold=args.tau,
        id_col="vec_id",
        vec_col="embedding",
        method="auto",
        n_rows=n,
        dim=d,
        allow_dense_output=True,  # top-k consumer: pairs feed rank
        # windows immediately, never a materialized pair table
    )
    mutual = mutual_knn_pairs_from(pairs, k=args.k).persist()
    n_mutual = mutual.count()
    wall = time.time() - t0
    print(f"dispatched mutual-kNN: {wall:.1f} s, {n_mutual} pairs")

    # 2) sampled exact ground truth via the blocked knn GEMM
    t1 = time.time()
    sample_q = (
        emb.orderBy(
            F.xxhash64(F.col("vec_id").cast("string")).asc(),
            F.col("vec_id").asc(),
        )
        .limit(args.samples)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
        .localCheckpoint(eager=True)
    )
    def topk_of(queries):
        got = semantic.knn_join(
            queries, emb, args.k + 1, method="blocked"
        ).filter(F.col("vec_id") != F.col("q_id"))
        # k+1 then self-exclude == top-k over others; τ floor applied
        from pyspark.sql import Window

        w = Window.partitionBy("q_id").orderBy(
            F.col("score").desc(), F.col("vec_id").asc()
        )
        return (
            got.withColumn("rk", F.row_number().over(w))
            .filter((F.col("rk") <= args.k) & (F.col("score") >= args.tau))
            .select("q_id", "vec_id", "score", "rk")
        )

    s_top = topk_of(sample_q).localCheckpoint(eager=True)
    nbr_ids = [
        r["vec_id"] for r in s_top.select("vec_id").distinct().collect()
    ]
    nbr_q = (
        emb.filter(F.col("vec_id").isin(nbr_ids))
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
        .localCheckpoint(eager=True)
    )
    b_top = topk_of(nbr_q).localCheckpoint(eager=True)
    # (s, b) mutual ⟺ b ∈ top-k(s) ∧ s ∈ top-k(b)
    sb = s_top.select(
        F.col("q_id").alias("s"), F.col("vec_id").alias("b")
    )
    bs = b_top.select(
        F.col("q_id").alias("b"), F.col("vec_id").alias("s")
    )
    exact_mutual = sb.join(bs, ["s", "b"]).select(
        F.least("s", "b").alias("id_a"), F.greatest("s", "b").alias("id_b")
    ).distinct().localCheckpoint(eager=True)
    n_exact = exact_mutual.count()
    gt_wall = time.time() - t1

    covered = mutual.select("id_a", "id_b").join(
        exact_mutual, ["id_a", "id_b"], "left_semi"
    ).count()
    recall = covered / n_exact if n_exact else 1.0
    # precision on the sample: dispatched mutual pairs with a sampled
    # endpoint that are NOT in the exact sampled mutual set
    sample_ids = [r["q_id"] for r in sample_q.select("q_id").collect()]
    incident = mutual.filter(
        F.col("id_a").isin(sample_ids) | F.col("id_b").isin(sample_ids)
    ).select("id_a", "id_b").localCheckpoint(eager=True)
    n_incident = incident.count()
    true_incident = incident.join(
        exact_mutual, ["id_a", "id_b"], "left_semi"
    ).count()
    precision = true_incident / n_incident if n_incident else 1.0
    print(
        f"sampled ground truth: {n_exact} exact mutual pairs over "
        f"{len(sample_ids)} sampled nodes ({gt_wall:.1f} s)"
    )
    print(
        f"END-TO-END mutual-kNN: recall {recall:.3f} "
        f"({covered}/{n_exact}), sampled precision {precision:.3f} "
        f"({true_incident}/{n_incident})"
    )
    print(
        json.dumps(
            {
                "metric": "mutual_knn_recall",
                "corpus": n,
                "tau": args.tau,
                "k": args.k,
                "pipeline_wall_sec": round(wall, 1),
                "pairs": n_mutual,
                "samples": len(sample_ids),
                "exact_mutual_sampled": n_exact,
                "recall": round(recall, 3),
                "precision": round(precision, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
