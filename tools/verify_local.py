"""Local stand-in for the driver's t2 correctness gate.

Runs every `queries()` entry on Spark and its `oracle_sql()` on DuckDB at
sf0.01, compares row count, column names, and an order-insensitive value
comparison (rows sorted, floats to 9 significant digits).

Usage: python tools/verify_local.py [name ...]
       python tools/verify_local.py --emit CORRECTNESS_FULL_r7.json [name ...]
       python tools/verify_local.py --sf /root/testdata/sf0.001 [--strict] [name ...]

--strict (with --sf): fail instead of noting when a golden query lacks
a pin at the requested SF, so golden additions can't silently demote to
rows-only smoke in the sweep.

--emit writes the results in the driver's CORRECTNESS row shape
({name: {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
err}}), so every round can commit a full-catalog correctness artifact
instead of the driver's 50-row sample (VERDICT r6 next-round #2).

--sf runs the whole comparison against a different fixture directory —
the second-scale-factor robustness sweep that catches SF-dependent
constants a single-SF gate can't. Golden-VALUES oracles are pinned to
the sf0.01 fixture, so at any other SF those queries are demoted to
rows-only smoke (the Spark side still executes and must not crash).
"""

from __future__ import annotations

import json
import math
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def canon_rows(rows):
    return sorted("|".join(canon(v) for v in row) for row in rows)


def main(
    names=None,
    emit_path: str | None = None,
    sf_dir: str = SF_DIR,
    strict: bool = False,
):
    import duckdb

    import __spark_entry__ as entry_mod
    from ai_vector_database_converstion_from_pdf_spark.session import get_spark

    spark = get_spark("verify-local", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if sf_dir != SF_DIR:
        # golden VALUES are pinned per-fixture: swap in the second-SF
        # golden set (tests/golden/<sfbase>/, from make_goldens.py --sf)
        # when it exists; only queries with no pin at this SF demote to
        # rows-only smoke (VERDICT r8 #3)
        import os as _os

        from ai_vector_database_converstion_from_pdf_spark import catalog

        alt = catalog._golden_oracles(
            sf_tag=_os.path.basename(_os.path.normpath(sf_dir))
        )
        demoted = 0
        for g in catalog._golden_oracles():
            if g in alt:
                oracles[g] = alt[g]
            else:
                oracles.pop(g, None)
                demoted += 1
        if demoted:
            if strict:
                # --strict: a missing second-SF pin is a FAILURE, not a
                # silent rows-only demotion — so golden additions can't
                # slip through the sweep unpinned (VERDICT r9 #8)
                sys.exit(
                    f"STRICT: {demoted} golden queries have no pin for "
                    f"{sf_dir}; generate with tools/make_goldens.py --sf"
                )
            print(
                f"note: {demoted} golden queries have no pin for this SF "
                "(rows-only smoke); generate with tools/make_goldens.py --sf"
            )
    picked = names or sorted(qs)
    failed = []
    results: dict[str, dict] = {}
    import time as _time

    for name in picked:
        fn = qs[name]
        _t0 = _time.monotonic()
        rec = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        results[name] = rec
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = [c.lower() for c in sdf.columns]
            spark_rows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(spark_rows)
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            rec["err"] = f"spark error {type(e).__name__}: {e}"[:300]
            failed.append(name)
            continue
        if name not in oracles:
            print(f"pass {name}: rows-only ({len(spark_rows)} rows, no oracle) [{_time.monotonic() - _t0:.1f}s]")
            rec.update(rows_match=True, schema_match=True, hash_match=True,
                       err="rows-only (no oracle)")
            continue
        try:
            res = con.sql(oracles[name])
            duck_cols = [c.lower() for c in res.columns]
            duck_rows = res.fetchall()
            rec["oracle_rows"] = len(duck_rows)
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            rec["err"] = f"duckdb error: {e}"[:300]
            failed.append(name)
            continue
        ok = True
        rec["schema_match"] = spark_cols == duck_cols
        rec["rows_match"] = len(spark_rows) == len(duck_rows)
        if not rec["schema_match"]:
            print(f"FAIL {name}: columns {spark_cols} != {duck_cols}")
            ok = False
        elif not rec["rows_match"]:
            print(f"FAIL {name}: rowcount {len(spark_rows)} != {len(duck_rows)}")
            ok = False
        else:
            a, b = canon_rows(spark_rows), canon_rows(duck_rows)
            rec["hash_match"] = a == b
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
                ok = False
        if ok:
            print(f"PASS {name} ({len(spark_rows)} rows) [{_time.monotonic() - _t0:.1f}s]")
        else:
            failed.append(name)
    print(f"\n{len(picked) - len(failed)}/{len(picked)} passed")
    if emit_path:
        with open(emit_path, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {len(results)} rows to {emit_path}")
    return 1 if failed else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    emit = None
    sf = SF_DIR
    if "--emit" in argv:
        i = argv.index("--emit")
        emit = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if "--sf" in argv:
        i = argv.index("--sf")
        sf = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    strict = "--strict" in argv
    if strict:
        argv.remove("--strict")
    sys.exit(main(argv or None, emit_path=emit, sf_dir=sf, strict=strict))
