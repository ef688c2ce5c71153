"""Dump .explain("formatted") for catalog queries to plans/<round>/.

Usage: python tools/dump_plans.py <suffix> <query> [<query> ...]
Writes plans/$DUMP_ROUND/<query>_<suffix>.txt for each query (suffix =
before|after; DUMP_ROUND defaults to r14). Set DUMP_REPO to run the
catalog from another checkout (for _before snapshots of
already-committed changes) while writing into this repo's plans dir.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    repo = os.environ.get("DUMP_REPO", here)
    sys.path.insert(0, repo)
    out_dir = os.path.join(here, "plans", os.environ.get("DUMP_ROUND", "r14"))
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dump-plans")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from ai_vector_database_converstion_from_pdf_spark import catalog

    qs = catalog.queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()
