"""AQE mis-broadcast audit (VERDICT r8 #6 / r9 #4).

The r8 incident: a stats misestimate after a crossJoin+persist let the
planner broadcast a corpus-sized vector table — collecting ~1 GB to the
driver. The fix pinned shuffle_hash on that join (dedup.py). This tool
sweeps the REMAINING big-side joins the same way a regression would
surface: run each suspect query end-to-end with AQE defaults, then read
the ACTUAL materialized `data size` of every BroadcastExchange from the
SQL status store (covering every execution the query triggered — memo
builds, checkpointed iterations, probes — not just the final plan).
A broadcast side with a corpus-scale ROW count (or a relation several
hash pages deep) is a misestimate: the planner promised a small side
and shipped a big one.

Metric caveat (measured): BroadcastExchange's `data size` reports the
hashed relation's estimatedSize, whose floor is ONE BytesToBytesMap
page — 64 MiB on this JVM — even for a 1,500-row side. So the flag is
two-signal: output rows above `--flag-rows` (default 1e6 — the r8
incident broadcast a 200k-row corpus vector table, far above any
legitimate dim side) OR data size above `--flag-mib` (default 256, i.e.
4+ pages of real payload). The single-page floor never trips either.

Usage: python tools/aqe_audit.py [--sf /tmp/sf1] [--flag-mib 256]
           [--flag-rows 1000000] [name ...]
Default suspect set: the GEMM candidate attaches, graph frontier joins,
and memo consumers. Exit 1 if any broadcast exceeds the flag line.
The same sweep runs as a pytest gate over a representative subset at
sf0.01 (tests/test_plan_regress.py::test_no_oversized_broadcasts).
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

# the big-side-join families: GEMM/LSH candidate attaches, graph
# frontier/label joins, shared-memo consumers, index-riding retrieval
SUSPECTS = [
    "dedup_embedding_cosine",
    "dedup_semdedup",
    "mutual_knn_pairs",
    "hard_negative_mining",
    "training_triplets",
    "maxsim_multi_vector",
    "embedding_outliers",
    "decontaminate_semantic",
    "source_embedding_drift",
    "embedding_matryoshka_recall",
    "graph_pagerank_simdocs",
    "graph_label_propagation",
    "graph_kcore",
    "graph_bfs_hops",
    "graph_link_prediction",
    "graph_core_triangles",
    "dedup_resolution",
    "dedup_quality_canonical",
    "leakage_safe_split",
    "tfidf_doc_similarity",
    "winnowing_matches",
    "q3_prf_expansion",
    "hybrid_rrf",
    "knn_multi",
]

_UNITS = {"B": 1, "KiB": 1024, "MiB": 1024**2, "GiB": 1024**3, "TiB": 1024**4}


def parse_size(s: str | None) -> int | None:
    """'Some(1027.9 KiB)' / '64.0 MiB' -> bytes; None when absent."""
    if not s:
        return None
    m = re.search(r"([\d.]+)\s*(B|KiB|MiB|GiB|TiB)", str(s))
    if not m:
        return None
    return int(float(m.group(1)) * _UNITS[m.group(2)])


def broadcast_sizes(spark, first_exec_id: int) -> list[tuple[int, str, int, int]]:
    """(execution_id, node_name, actual_bytes, output_rows) for every
    BroadcastExchange in every SQL execution >= first_exec_id."""
    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    out = []
    for i in range(execs.size()):
        e = execs.apply(i)
        eid = e.executionId()
        if eid < first_exec_id:
            continue
        mv = store.executionMetrics(eid)
        nodes = store.planGraph(eid).allNodes()
        for j in range(nodes.size()):
            nd = nodes.apply(j)
            if "BroadcastExchange" not in nd.name():
                continue
            ms = nd.metrics()
            b = rows = None
            for k in range(ms.size()):
                m = ms.apply(k)
                if m.name() == "data size":
                    b = parse_size(mv.get(m.accumulatorId()))
                elif m.name() == "number of output rows":
                    raw = str(mv.get(m.accumulatorId()))
                    digits = re.sub(r"[^\d]", "", raw)
                    rows = int(digits) if digits else None
            if b is not None:
                out.append((eid, nd.name(), b, rows or 0))
    return out


def next_exec_id(spark) -> int:
    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    if execs.size() == 0:
        return 0
    return execs.apply(execs.size() - 1).executionId() + 1


def audit_query(spark, sf_dir: str, name: str, fn) -> tuple[int, int, list]:
    """Run one catalog query to completion; return (max broadcast
    bytes, max broadcast rows, all broadcast records) across every
    execution it triggered."""
    start = next_exec_id(spark)
    fn(spark, sf_dir).count()
    recs = broadcast_sizes(spark, start)
    return (
        max((b for _, _, b, _ in recs), default=0),
        max((r for _, _, _, r in recs), default=0),
        recs,
    )


def main() -> int:
    argv = sys.argv[1:]
    sf = "/tmp/sf1"
    flag_mib = 256.0
    flag_rows = 1_000_000
    if "--sf" in argv:
        i = argv.index("--sf")
        sf = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if "--flag-mib" in argv:
        i = argv.index("--flag-mib")
        flag_mib = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    if "--flag-rows" in argv:
        i = argv.index("--flag-rows")
        flag_rows = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]

    from ai_vector_database_converstion_from_pdf_spark import catalog
    from ai_vector_database_converstion_from_pdf_spark.session import get_spark

    spark = get_spark("aqe-audit")
    qs = catalog.queries()
    picked = argv or SUSPECTS
    flagged = []
    for name in picked:
        mx_b, mx_r, recs = audit_query(spark, sf, name, qs[name])
        status = "OK"
        if mx_b > flag_mib * 1024**2 or mx_r > flag_rows:
            status = f"FLAG (> {flag_mib} MiB or > {flag_rows} rows)"
            flagged.append(name)
        print(
            f"{name}: {len(recs)} broadcasts, max {mx_b / 1024**2:.1f} MiB, "
            f"max {mx_r} rows  {status}"
        )
    print(f"\n{len(picked) - len(flagged)}/{len(picked)} clean")
    if flagged:
        print("flagged:", flagged)
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
