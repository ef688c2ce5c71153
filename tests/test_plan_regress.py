"""Physical-plan regression gate: the scale-critical plan shapes the
docs claim (broadcast dims, TakeOrdered top-k, pushed filters, no
accidental sort-merge/cartesian/Python stages) asserted inside pytest,
so a refactor that silently degrades a plan fails the suite — not just
the manually-run tools/plan_audit.py.

Subset rule: only entries whose DataFrame CONSTRUCTION is lazy (no
eager index build / checkpoint / training at build time), so the whole
test is planning-only and stays fast. The full map still runs via
`python tools/plan_audit.py` (writes PLANS.md).
"""

import sys

sys.path.insert(0, "/root/repo/tools")

from plan_audit import EXPECT, audit  # noqa: E402

# lazy-construction entries only — building the DataFrame runs no job
FAST_SUBSET = [
    "q1_semantic_topk",
    "q3_keyword_search",
    "q3_phrase_search",
    "hybrid_rrf",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q18_large_orders",
    "star_join_revenue",
    "pii_redact",
    "decontaminate_ngrams",
    "decontaminate_semantic",
    "dedup_ngram_jaccard",
    "curation_pipeline",
    "skew_salted_join_revenue",
    "sample_weighted_priority",
    "events_lag_features",
    "events_sequence_pattern",
    "events_time_weighted_avg",
    "events_attribution",
    "token_budget_select",
    "dedup_containment",
    "maxsim_multi_vector",
    "events_ab_welch",
    "q3_prf_expansion",
    "source_embedding_drift",
    "events_assoc_lift",
    "events_time_to_convert",
    "langid_confusion",
    "langid_trigram_confusion",
    "events_decayed_engagement",
    "events_markov_transitions",
    "orders_priority_islands",
    "dedup_duplicate_spans",
    "unpivot_status_qty",
    "events_daily_trend_ols",
    "text_readability",
    "winnowing_matches",
    "bigram_surprisal_score",
    "tfidf_doc_similarity",
    "kn_surprisal_score",
    "q3_fuzzy_search",
    "embedding_matryoshka_recall",
    "events_holt_forecast",
    "events_top_paths",
]


def test_subset_is_registered():
    missing = [n for n in FAST_SUBSET if n not in EXPECT]
    assert not missing, f"not in plan_audit.EXPECT: {missing}"


def test_plan_shapes_hold(spark):
    failures, report = audit(spark, FAST_SUBSET, verbose=False)
    detail = "\n".join(
        line for line in report if any(f in line for f in failures)
    )
    assert not failures, f"plan regressions: {failures}\n{detail}"


def test_no_oversized_broadcasts(spark):
    """AQE mis-broadcast gate (VERDICT r8 #6 / r9 #4): run the big-side
    join families end-to-end and read every BroadcastExchange's ACTUAL
    materialized size from the SQL status store — a broadcast side
    materially above the 10 MB autoBroadcastJoinThreshold means the
    planner was misled by a stats estimate (the r8 incident shape: a
    crossJoin+persist made a corpus-sized vector table look tiny and
    broadcast ~200k vector rows). The full suspect set runs at the 10x
    stress tier via `python tools/aqe_audit.py`; this gate keeps a
    representative subset regression-checked at sf0.01 on every suite
    run. Flag is two-signal (see the tool docstring): a hashed
    relation's reported `data size` has a one-64MiB-page floor even for
    a 1,500-row side, so size alone over-flags — rows above the
    fixture's corpus scale, or size of 4+ pages, is the misestimate
    signal."""
    from aqe_audit import audit_query

    from ai_vector_database_converstion_from_pdf_spark import catalog

    qs = catalog.queries()
    sf = "/root/testdata/sf0.01"
    flag_bytes = 256 * 1024**2
    flag_rows = 100_000  # sf0.01: every legitimate dim side is <= ~20k rows
    offenders = {}
    for name in (
        "dedup_embedding_cosine",
        "mutual_knn_pairs",
        "graph_pagerank_simdocs",
        "graph_link_prediction",
        "dedup_resolution",
        "hybrid_rrf",
        "knn_multi",
    ):
        mx_b, mx_r, _recs = audit_query(spark, sf, name, qs[name])
        if mx_b > flag_bytes or mx_r > flag_rows:
            offenders[name] = (mx_b, mx_r)
    assert not offenders, f"oversized broadcast sides: {offenders}"
