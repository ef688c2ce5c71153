"""Spot-time catalog queries exactly like bench.py (min-of-N to count).

Usage: python tools/time_queries.py <query> [<query> ...] [--reps=N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 2
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from ai_vector_database_converstion_from_pdf_spark import catalog
    from ai_vector_database_converstion_from_pdf_spark.session import get_spark

    spark = get_spark("spot-time")
    qs = catalog.queries()
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    for name in names:
        fn = qs[name]
        best, times, rows = float("inf"), [], 0
        for _ in range(reps):
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            times.append(round(dt, 3))
            best = min(best, dt)
        print(
            f"{name}: min {best:.3f}s reps {times} ({rows} rows, "
            f"load {os.getloadavg()[0]:.1f})"
        )


if __name__ == "__main__":
    main()
