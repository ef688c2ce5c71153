"""Generate an N-times scaled copy of a driver fixture (default: 10x
sf0.1 -> /tmp/sf1) so the FULL 110+-query bench suite can run one tier
above its graded scale factor (VERDICT r8 #1 / r9 #2).

Replication preserves every column and the fixtures' join structure:

- region/nation: fixed dimensions, copied as-is (TPC-H scaling rule).
- customer/supplier/part: primary keys shifted by replica*OFFSET.
- orders: o_orderkey AND o_custkey shifted together, so each order
  points at its own replica's customer — per-key join selectivity is
  exactly the sf0.1 value, only cardinality grows.
- lineitem: l_orderkey/l_partkey/l_suppkey all shifted together.
- events: event_id/user_id shifted (10x users, same per-user history);
  timestamps unchanged, so the event-time range densifies 10x — the
  windowed/sessionize family sees 10x state, not a longer horizon.
- documents/embeddings: ids shifted, text/vectors copied verbatim —
  every doc gains mult-1 EXACT replicas (the planted-duplicate stress
  shape every 10x stress session used): the similarity graph becomes
  replica near-cliques, deliberately tripping the Sigma-deg^2 / FLOP
  auto-dispatch gates so the sweep logs which operators switch.

Usage: python tools/make_stress_fixture.py [--mult 10]
           [--src /root/testdata/sf0.1] [--out /tmp/sf1]
Then:  SPARK_GRAFT_SF_DIR=/tmp/sf1 python bench.py
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, "/root/repo")

OFFSET = 10_000_000  # > any key in sf0.1; replica r adds r*OFFSET

SHIFT_COLS = {
    "region": (),
    "nation": (),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ai_vector_database_converstion_from_pdf_spark.session import get_spark
    from ai_vector_database_converstion_from_pdf_spark.sources.tables import (
        load_events,
    )

    spark = get_spark("make-stress-fixture")
    os.makedirs(args.out, exist_ok=True)
    reps = spark.range(args.mult).select(F.col("id").alias("_rep"))
    for table, keys in SHIFT_COLS.items():
        src = f"{args.src}/{table}.parquet"
        dst = f"{args.out}/{table}.parquet"
        # events: normalize nanos/NTZ timestamps exactly as the engine
        # reads them, so the scaled fixture is plain micros
        df = load_events(spark, args.src) if table == "events" else spark.read.parquet(src)
        if keys:
            df = df.crossJoin(F.broadcast(reps)).select(
                *[
                    (F.col(c) + F.col("_rep") * OFFSET).cast("long").alias(c)
                    if c in keys
                    else F.col(c)
                    for c in df.columns
                    if c != "_rep"
                ]
            )
        df.write.mode("overwrite").parquet(dst)
        n = spark.read.parquet(dst).count()
        print(f"wrote {dst}: {n} rows")


if __name__ == "__main__":
    main()
