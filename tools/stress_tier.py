"""Time catalog queries against an arbitrary stress fixture tier.

Generic runner for the scale ladder (sf0.1 -> 10x -> 100x): executes
named `__spark_entry__.queries()` entries against `--sf-dir` (a fixture
directory produced by tools/make_stress_fixture.py or a driver sf dir),
timing one full materialization (count) each, and prints ONE JSON line
{"sf_dir":..., "queries": {name: {"sec":..., "rows":...}}} for
BASELINE.md bookkeeping.

--fresh-session (VERDICT r10 #6): restart the SparkSession (new app id)
before EVERY query. The session-memoized shared builds in catalog.py
(_sim_graph, _ngram_pairs, _quotient_graph, ... — keyed on app id) then
rebuild per query, so each number is the query's STANDALONE cost: the
shared-session sweep's per-query ratios understate consumers of a
memoized build (a 0.09 s "dedup_ngram_jaccard" is a cache read). Use
the default shared session for pipeline accounting (materialize once,
analyze many) and --fresh-session for per-query comparisons.

Usage:
  python tools/stress_tier.py --sf-dir /tmp/sf10 [--cpus 32] q1 q2 ...
  python tools/stress_tier.py --sf-dir /tmp/sf1 --all-dedup
  python tools/stress_tier.py --sf-dir /tmp/sf1 --fresh-session q1 q2
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

DEDUP_SET = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_prefix",
    "dedup_simhash_pairs",
    "dedup_cross_source_overlap",
]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--all-dedup", action="store_true")
    ap.add_argument("--fresh-session", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args(argv)

    from ai_vector_database_converstion_from_pdf_spark.session import get_spark
    from __spark_entry__ import queries

    names = list(args.names)
    if args.all_dedup:
        names = DEDUP_SET + [n for n in names if n not in DEDUP_SET]
    if not names:
        ap.error("no query names given")

    qs = queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        ap.error(f"unknown queries: {unknown}")

    spark = get_spark("stress_tier", cpus=args.cpus)
    out = {}
    for i, name in enumerate(names):
        if args.fresh_session and i > 0:
            # new JVM app id -> every catalog memo cache misses; the
            # next query pays its own shared-build cost
            spark.stop()
            spark = get_spark(f"stress_tier_{i}", cpus=args.cpus)
        t0 = time.time()
        try:
            rows = qs[name](spark, args.sf_dir).count()
            out[name] = {"sec": round(time.time() - t0, 2), "rows": rows}
        except Exception as e:  # record, keep sweeping
            out[name] = {
                "sec": round(time.time() - t0, 2),
                "error": f"{type(e).__name__}: {e}"[:200],
            }
        print(f"{name}: {out[name]}", file=sys.stderr, flush=True)
    payload = {"sf_dir": args.sf_dir, "queries": out}
    if args.fresh_session:
        payload["mode"] = "fresh-session-per-query"
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    sys.exit(main())
