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
