"""Winnowing planted-passage recall at a MIXED tier (r13, VERDICT r12
#7): passages + paraphrase noise + replicas TOGETHER — the one
combination the winnowing family had not been exercised on (r12's
planted run rode the pure-replica 10x tier).

Re-derives the planted passage id from the fixture rule (selection and
pid key on (original doc id, replica) through xxhash64 — the final doc
ids are orig + replica·OFFSET), builds the expected same-passage pair
set, runs winnowing_matches(collapse="auto") + the cap report, and
asserts FULL planted recall with the planted fingerprints under the df
cap while boilerplate stays over it.

Usage: python tools/stress_winnowing_tier.py [--src /tmp/sf10mixpp]
           [--passages 1024] [--pct 5]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

OFFSET = 10_000_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/sf10mixpp")
    ap.add_argument("--passages", type=int, default=1024)
    ap.add_argument("--pct", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ai_vector_database_converstion_from_pdf_spark.operators.textstats import (
        winnowing_cap_report,
        winnowing_matches,
    )
    from ai_vector_database_converstion_from_pdf_spark.session import get_spark

    spark = get_spark("stress-winnowing-tier")
    docs = spark.read.parquet(f"{args.src}/documents.parquet")
    n = docs.count()
    # re-derive the planted selection/pid exactly as the generator drew
    # them: keys are (ORIGINAL doc id, replica)
    orig = F.pmod(F.col("doc_id"), F.lit(OFFSET))
    rep = (F.col("doc_id") / F.lit(OFFSET)).cast("long")
    sel = F.pmod(
        F.xxhash64(orig, rep, F.lit("pp")), F.lit(100)
    ) < F.lit(args.pct)
    pid = F.when(
        sel,
        F.pmod(F.xxhash64(orig, rep, F.lit("ppid")), F.lit(args.passages)),
    )
    tagged = docs.select("doc_id", pid.alias("pid")).filter(
        F.col("pid").isNotNull()
    ).localCheckpoint(eager=True)
    n_planted = tagged.count()
    groups = tagged.groupBy("pid").count()
    gstats = groups.agg(
        F.max("count").alias("mx"), F.avg("count").alias("avg")
    ).first()
    a = tagged.select(F.col("doc_id").alias("id_a"), "pid")
    b = tagged.select(F.col("doc_id").alias("id_b"), "pid")
    expected = (
        a.join(b, "pid")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    n_expected = expected.count()
    print(
        f"{n} docs, {n_planted} planted over {args.passages} passages "
        f"(max group {gstats['mx']}, avg {gstats['avg']:.1f}) → "
        f"{n_expected} expected same-passage pairs"
    )

    t0 = time.time()
    got = winnowing_matches(
        docs.select("doc_id", "text"), collapse="auto"
    ).persist()
    n_got = got.count()
    wall = time.time() - t0
    covered = expected.join(
        got.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi"
    ).count()
    recall = covered / n_expected if n_expected else 1.0
    print(
        f"winnowing_matches: {wall:.1f} s, {n_got} pairs; planted "
        f"recall {recall:.4f} ({covered}/{n_expected})"
    )

    t1 = time.time()
    rep_row = winnowing_cap_report(docs.select("doc_id", "text")).first()
    print(
        f"cap report ({time.time() - t1:.1f} s): "
        f"{rep_row['n_fingerprints']} shared fingerprints, "
        f"{rep_row['n_hot']} over-cap (boilerplate)"
    )
    assert recall >= 0.999, recall
    print(
        json.dumps(
            {
                "metric": "winnowing_mixed_tier",
                "docs": n,
                "planted_docs": n_planted,
                "expected_pairs": n_expected,
                "matched_pairs": n_got,
                "planted_recall": round(recall, 4),
                "wall_sec": round(wall, 1),
                "fingerprints": rep_row["n_fingerprints"],
                "over_cap": rep_row["n_hot"],
            }
        )
    )


if __name__ == "__main__":
    main()
