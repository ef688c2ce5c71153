"""Physical-plan audit: prints `explain(formatted)` extracts for the
headline queries and asserts the scale-critical plan properties README
claims. Writes PLANS.md. Usage: python tools/plan_audit.py"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"

EXPECT = {
    "q1_semantic_topk": ["TakeOrderedAndProject"],       # no global sort
    "q3_keyword_search": ["TakeOrderedAndProject"],
    "hybrid_rrf": ["BroadcastHashJoin", "TakeOrderedAndProject", "!SortMergeJoin"],
    "tpch_q1_pricing_summary": ["PushedFilters: [IsNotNull(l_shipdate)"],
    "tpch_q3_shipping_priority": ["PushedFilters", "BroadcastHashJoin"],
    "star_join_revenue": ["BroadcastHashJoin"],
    "knn_multi": ["BroadcastNestedLoopJoin"],             # deliberate: tiny query side x corpus
    "dedup_minhash_lsh": [],
    "dedup_embedding_cosine": ["MapInPandas"],            # GEMM path
    "dedup_ngram_jaccard": ["!SortMergeJoin"],            # posting-list pair explode
    "events_sessionize": [],
    "text_profile": [],
    "q3_phrase_search": ["TakeOrderedAndProject"],
    "q3_heading_context_search": ["TakeOrderedAndProject"],
    "hybrid_rrf_batch": ["!SortMergeJoin"],
    # eval side broadcast: the training corpus must never shuffle
    "decontaminate_ngrams": ["BroadcastHashJoin", "!SortMergeJoin"],
    # pure regexp expressions: no UDF, no join anywhere in the scrub
    "pii_redact": ["!MapInPandas", "!BroadcastHashJoin", "!SortMergeJoin"],
    # two-stage int8: shortlist is a TakeOrdered over the int8 scan, no UDF
    "ann_int8_rescore_topk": ["TakeOrderedAndProject", "!ArrowEvalPython", "!MapInPandas"],
    # unified selector at the near-uniform fixture: the probe picks the
    # int8 auto-shortlist branch — same plan contract as the fixed entry
    "ann_auto_topk": ["TakeOrderedAndProject", "!ArrowEvalPython", "!MapInPandas"],
    # nation dims broadcast; the fact table never sort-merge-joins a dim
    "tpch_q7_volume_shipping": ["BroadcastHashJoin", "PushedFilters"],
    "tpch_q10_returned_items": ["BroadcastHashJoin", "PushedFilters"],
    "tpch_q18_large_orders": ["LeftSemi"],
    # salting must not defeat the broadcast of the replicated dim
    "skew_salted_join_revenue": ["BroadcastHashJoin", "!SortMergeJoin"],
    # composed curation: union + one groupBy(doc_id) assembly — no
    # corpus-sized sort-merge join anywhere, no Python UDF anywhere
    "curation_pipeline": ["!SortMergeJoin", "!ArrowEvalPython", "!MapInPandas"],
    # FTS prefix/NEAR/boolean: top-k without global sort, postings
    # In/StartsWith filtered before any shuffle
    "q3_prefix_search": ["TakeOrderedAndProject"],
    "q3_near_search": ["TakeOrderedAndProject"],
    "q3_boolean_search": ["TakeOrderedAndProject"],
    # IVF coarse assign: centroids are plan literals — no join, no
    # exchange before the output sort
    "embedding_cluster_assign": ["!SortMergeJoin", "!BroadcastHashJoin"],
    # Q6 is the pushdown litmus: every predicate must reach the scan
    "tpch_q6_forecast_revenue": ["PushedFilters: [IsNotNull(l_shipdate)", "!SortMergeJoin"],
    "tpch_q14_promo_effect": ["BroadcastHashJoin", "PushedFilters", "!SortMergeJoin"],
    "tpch_q22_sales_opportunity": ["PushedFilters"],
    # bucket offsets broadcast back; the corpus-wide rank must not
    # sort-merge-join and the per-bucket window is the only big exchange
    "train_shuffle_order": ["BroadcastHashJoin", "!SortMergeJoin"],
    # vocab-sized df table joins the (doc,term) counts
    "tfidf_top_terms": [],
    "sequence_pack": ["FlatMapGroupsInPandas"],
    # 8-table chain: every dim side broadcast, fact never sort-merges a dim
    "tpch_q8_market_share": ["BroadcastHashJoin", "PushedFilters"],
    "tpch_q13_custdist": ["PushedFilters"],
    # decorrelated threshold agg joins part-keyed
    "tpch_q17_small_quantity_revenue": ["BroadcastHashJoin", "PushedFilters"],
    # EXISTS decorrelated to a left-semi; order-date range pushed to scan
    "tpch_q4_order_priority": ["LeftSemi", "PushedFilters"],
    # shipdate range pushed below the fact-fact join
    "tpch_q12_late_lineitems": ["PushedFilters"],
    # one suppkey shuffle; scalar max + supplier dim both broadcast
    "tpch_q15_top_supplier": ["BroadcastHashJoin", "PushedFilters"],
    # disjunctive predicate splits below the broadcast part join
    "tpch_q19_discounted_revenue": ["BroadcastHashJoin", "PushedFilters"],
    # the semi/anti pair both resolve without a cartesian
    "tpch_q21_waiting_suppliers": ["LeftSemi", "LeftAnti", "BroadcastHashJoin"],
    # one gram-keyed groupBy carrying both aggregates
    "corpus_ngram_counts": ["!SortMergeJoin", "TakeOrderedAndProject"],
    # pure expressions into one source-keyed agg — no UDF, no join
    "source_quality_report": ["!SortMergeJoin", "!MapInPandas"],
    # quartile breakpoints broadcast back; no global ntile window, no SMJ
    "events_rfm_segments": ["!SortMergeJoin", "!Window"],
    # candidate pairs broadcast into the two corpus text fetches;
    # levenshtein verifies candidates only — never an all-pairs join
    "dedup_edit_distance": ["BroadcastHashJoin", "!SortMergeJoin"],
    # growth accounting: user-partitioned lag, tiny day x status rollup
    "events_user_lifecycle": ["!SortMergeJoin", "!MapInPandas"],
    # per-user spine explode + co-partitioned join + partitioned fill
    "events_gapfill_daily": ["!MapInPandas", "!BroadcastNestedLoopJoin"],
    # gaps-and-islands: both windows share ONE custkey sort, no join
    "orders_priority_islands": ["!SortMergeJoin", "!BroadcastHashJoin"],
    # substring-level dedup: map-only shingling, agg-only — no join at all
    "dedup_duplicate_spans": ["!SortMergeJoin", "!BroadcastHashJoin", "!MapInPandas"],
    # two chained aggregates (daily partials -> union), no join, no UDF
    "events_hll_incremental_rollup": ["!SortMergeJoin", "!BroadcastHashJoin", "!MapInPandas"],
    # user-partitioned lead + tiny transition-table window — no SMJ
    "events_markov_transitions": ["!SortMergeJoin", "!MapInPandas"],
    # day-explode contribution + broadcast day semi-join: the rolling
    # distinct must NOT plan the oracle's nested-loop range join
    "events_rolling_7d_users": ["!BroadcastNestedLoopJoin", "!SortMergeJoin"],
    # one aggregate scan of expression flags — no join, no UDF
    "embedding_quality_report": ["!SortMergeJoin", "!BroadcastHashJoin", "!MapInPandas"],
    # returned plan is the candidate RECOUNT only (the MG mapInPandas
    # pass ran eagerly at DF-build time to collect the bounded summary):
    # an In-filter + agg, never a join — the vocabulary-sized shuffle of
    # the naive plan must not appear
    "text_heavy_hitters": ["!SortMergeJoin", "!BroadcastHashJoin"],
    # priority = narrow expressions + TakeOrdered: NO shuffle at all
    "sample_weighted_priority": ["TakeOrderedAndProject", "!Exchange", "!SortMergeJoin"],
    # strata-sized count table broadcast back over one corpus scan
    "source_mixture_sample": ["BroadcastHashJoin", "!SortMergeJoin"],
    # tiny per-type stats broadcast back onto the daily pre-aggregate
    "events_daily_anomalies": ["BroadcastHashJoin", "!SortMergeJoin", "!Window"],
    # pair family broadcast against the narrow (doc_id, source) projection
    # pair side is NOT hint-broadcast (24M rows at the 10x replica tier
    # — a forced broadcast there is the mis-broadcast failure mode);
    # the labeling joins are id-keyed shuffle-safe joins that AQE
    # converts to broadcast at runtime when the pair list is small
    "dedup_cross_source_overlap": ["!BroadcastNestedLoopJoin", "!CartesianProduct"],
    # codegen'd bigram explode; both count tables join back broadcast
    "bigram_surprisal_score": ["!MapInPandas", "!SortMergeJoin"],
    # moments + projection are map-side GEMM passes; no join anywhere
    "embedding_pca_project": ["MapInPandas", "!SortMergeJoin", "!BroadcastHashJoin"],
    # encoding is map-side; the per-lang rollup joins the narrow meta
    # projection broadcast (plan reflects the ENCODE stage — training
    # ran eagerly at DF-build time, see catalog._bpe_trained)
    "bpe_compression_by_lang": ["MapInPandas", "!SortMergeJoin"],
    # bucket offsets broadcast; the rank-band join keys on a unique int
    "dedup_sorted_neighborhood": ["BroadcastHashJoin", "!BroadcastNestedLoopJoin", "!MapInPandas"],
    # prefix postings explode + candidate-keyed verify — no UDF
    "dedup_ngram_prefix": ["!MapInPandas", "!BroadcastNestedLoopJoin"],
    # CC label propagation + one cluster-keyed window — no UDF
    "dedup_quality_canonical": ["!MapInPandas"],
    # vocab-sized word-score join; final top-k without global sort
    "text_rake_keywords": ["TakeOrderedAndProject", "!MapInPandas"],
    # map-side assign, tiny stats broadcast back — no SMJ, no UDF
    "embedding_outliers": ["BroadcastHashJoin", "!SortMergeJoin", "!MapInPandas"],
    # pure codegen bit math — no join, no UDF
    "events_zorder_key": ["!SortMergeJoin", "!BroadcastHashJoin", "!MapInPandas"],
    # batch band keys broadcast into the corpus band table
    "dedup_incremental_batch": ["BroadcastHashJoin", "!MapInPandas"],
    # sources x buckets domain built on TINY aggregates only
    "source_psi_drift": ["!MapInPandas", "!SortMergeJoin"],
    # returned frame is the final round's eager localCheckpoint scan
    # (per-round lineage cut — the CC/PageRank idiom); no UDF anywhere
    "graph_label_propagation": ["!MapInPandas", "!ArrowEvalPython"],
    # post-dedup LPA composition: resolution keep-set and per-round
    # label frames are checkpointed upstream, so the audited plan is
    # the final round's joins + orderBy — no Python stage anywhere
    "graph_label_propagation_curated": [
        "!MapInPandas",
        "!ArrowEvalPython",
        "!CartesianProduct",
    ],
    # map-side decay terms + ONE user agg + TakeOrdered — no join/window
    "events_decayed_engagement": ["TakeOrderedAndProject", "!SortMergeJoin", "!BroadcastHashJoin", "!Window"],
    # Expand-based wide->long — no join, no UDF
    "unpivot_status_qty": ["!SortMergeJoin", "!MapInPandas", "!BroadcastHashJoin"],
    # tiny per-type bounds broadcast back; clip is map-side
    "events_value_winsorized": ["BroadcastHashJoin", "!SortMergeJoin", "!Window"],
    # two tiny type aggregates broadcast back over the daily pre-agg
    "events_robust_anomalies": ["BroadcastHashJoin", "!SortMergeJoin", "!Window"],
    # packed sign bits + bit_count(xor): pure codegen, TakeOrdered both stages
    "ann_hamming_topk": ["TakeOrderedAndProject", "!ArrowEvalPython", "!MapInPandas"],
    # bloom probe is a JVM bitmap-literal test (r13): NO Python stage
    # anywhere; verify join stays broadcast
    "decontaminate_bloom": ["!ArrowEvalPython", "BroadcastHashJoin", "!SortMergeJoin"],
    # returned frame is the eager localCheckpoint scan (graph idiom):
    # the audited plan is ONLY the final scan, so no-Python/no-join
    # assertions would be vacuous here. The operator itself is pure
    # DataFrame joins/aggs (operators/graph.py:triangle_counts — no UDF
    # in the source); correctness vs brute force is pytest-checked.
    "graph_triangle_counts": [],
    # df-capped posting self-join; final top-k without global sort
    "tfidf_doc_similarity": ["TakeOrderedAndProject", "!MapInPandas"],
    # pure post-aggregate algebra: no join, no window, no UDF
    "events_daily_trend_ols": ["!SortMergeJoin", "!BroadcastHashJoin", "!Window", "!MapInPandas"],
    # tiny per-type min/max broadcast back; bucket math map-side
    "events_value_histogram": ["BroadcastHashJoin", "!SortMergeJoin", "!Window"],
    # 512-row lambda table broadcast onto the (doc,bucket) aggregate
    "sample_dsir_weights": ["BroadcastHashJoin", "!SortMergeJoin", "!MapInPandas"],
    # r13: the scoring pass has NO join at all — weights ship as one
    # dense array<long> literal read via element_at (the gradient joins
    # live in the training collects, broadcast under the doc bound);
    # no Python stage anywhere, top-k without global sort
    "quality_linear_probe": [
        "TakeOrderedAndProject",
        "!BroadcastHashJoin",
        "!SortMergeJoin",
        "!MapInPandas",
        "!ArrowEvalPython",
    ],
    # union + flipped-order window: still one key shuffle, no join
    "events_asof_join_forward": ["!SortMergeJoin", "!BroadcastHashJoin", "!MapInPandas"],
    # both directional windows share ONE key exchange; map-side pick
    "events_asof_join_nearest": ["!SortMergeJoin", "!BroadcastHashJoin", "!MapInPandas"],
    # returned frame is the eager localCheckpoint scan (graph idiom);
    # the pair search behind it was cluster-scoped, never N^2 — but the
    # audited plan is only that scan, so assertions would be vacuous
    "dedup_semdedup": [],
    # type-partitioned windows over the (type, day) pre-agg — no join
    "events_lag_features": ["!SortMergeJoin", "!BroadcastHashJoin", "!MapInPandas"],
    # node-sized checkpointed deg x triangle frames — the audited plan
    # is only the post-checkpoint join, so Python-stage assertions on
    # the upstream pipeline would be vacuous (see graph_triangle_counts)
    "graph_clustering_coefficient": [],
    # per-round checkpointed peel frames: audited plan is only the
    # final survivor/peeled union over checkpoint scans — upstream
    # assertions would be vacuous (see graph_triangle_counts)
    "graph_kcore": [],
    # broadcast query side; qrels join + per-query agg — no Python stage
    "retrieval_eval_labels": ["!MapInPandas", "!ArrowEvalPython", "BroadcastNestedLoopJoin"],
    # one scan, pure regex/HOF expressions — no join, no UDF
    "text_readability": ["!SortMergeJoin", "!BroadcastHashJoin", "!MapInPandas"],
    # posting-list pair explosion with the hot cap — no all-pairs join
    "winnowing_matches": ["!MapInPandas", "!BroadcastNestedLoopJoin"],
    # derived-partsupp family: the supplier→nation→region dim chain and
    # the decorrelated scalar/min sides must broadcast; nothing in the
    # family may fall back to a cartesian product
    "tpch_q2_min_cost_supplier": ["BroadcastHashJoin", "!CartesianProduct", "!BroadcastNestedLoopJoin"],
    "tpch_q9_product_type_profit": ["BroadcastHashJoin", "PushedFilters", "!CartesianProduct"],
    # the one-row cutoff joins back by broadcast NLJ (no key), never cartesian
    "tpch_q11_important_stock": ["BroadcastHashJoin", "!CartesianProduct"],
    "tpch_q16_parts_supplier_relationship": ["BroadcastHashJoin", "LeftAnti", "!CartesianProduct"],
    "tpch_q20_potential_part_promotion": ["BroadcastHashJoin", "PushedFilters", "!CartesianProduct"],
    # eval matrix rides in the mapInPandas closure: ONE Python GEMM
    # stage over the corpus scan, no join, no corpus shuffle
    "decontaminate_semantic": ["MapInPandas", "!SortMergeJoin", "!BroadcastHashJoin"],
    # CEP per-user sequence: one groupBy(user) carrying the collect +
    # codegen'd regexp counts — no join, no corpus window, no UDF
    "events_sequence_pattern": ["!SortMergeJoin", "!BroadcastHashJoin", "!MapInPandas"],
    # trapezoidal TWA: the lead window and the final agg share the
    # user_id key — no join, no UDF
    "events_time_weighted_avg": ["!SortMergeJoin", "!BroadcastHashJoin", "!MapInPandas"],
    # first/last-touch: both window frames share ONE user_id shuffle;
    # no self-join against the event history, no UDF
    "events_attribution": ["!SortMergeJoin", "!BroadcastHashJoin", "!MapInPandas"],
    # greedy per-source prefix: source-partitioned cum-sum window only —
    # never a global (unpartitioned) window, no join, no UDF
    "token_budget_select": ["!SortMergeJoin", "!BroadcastHashJoin", "!MapInPandas"],
    # posting-list containment: pair explode from the grouped postings,
    # directed scores map-side — same no-SMJ shape as the Jaccard entry
    "dedup_containment": ["!SortMergeJoin"],
    # late interaction: tiny query set broadcast into a codegen'd
    # corpus scan (corpus x |Q| rows), two keyed aggs, TakeOrdered
    "maxsim_multi_vector": [
        "BroadcastNestedLoopJoin", "TakeOrderedAndProject",
        "!SortMergeJoin", "!MapInPandas",
    ],
    # mutual-kNN: candidates from the blocked GEMM (MapInPandas scan),
    # then windows + an equi-join over candidate pairs only — no SMJ
    # would be wrong here (two N*k sides meet on (src,dst)); assert no
    # cartesian instead
    "mutual_knn_pairs": ["!CartesianProduct"],
    # Welch A/B: one groupBy(event_type) of conditional raw moments —
    # no join, no window, no UDF
    "events_ab_welch": ["!SortMergeJoin", "!BroadcastHashJoin", "!MapInPandas"],
    # PRF expansion: both ranking stages TakeOrdered; feedback set and
    # term tables broadcast — the corpus posting table never SMJs
    "q3_prf_expansion": ["TakeOrderedAndProject", "!SortMergeJoin", "!MapInPandas"],
    # centroid drift: fixed-width keyed agg + broadcast 1-row corpus
    # partials — no window, no UDF, no explode
    "source_embedding_drift": ["!SortMergeJoin", "!MapInPandas", "!Window", "!Generate"],
    # association lift: user-keyed self-join (type-vocabulary fan) +
    # broadcast marginals — no SMJ, no window, no UDF
    "events_assoc_lift": ["!SortMergeJoin", "!MapInPandas", "!Window"],
    # funnel latency: user-keyed mins + join, cohort rollup broadcast —
    # no window, no UDF
    "events_time_to_convert": ["!SortMergeJoin", "!MapInPandas", "!Window"],
    # lang-ID eval: map-side classification + tiny rollup; the share
    # window runs over the (lang x pred) result, not the corpus
    "langid_confusion": ["!SortMergeJoin", "!MapInPandas", "!BroadcastHashJoin"],
    # trigram lang-ID: ONE shuffle-free mapInPandas classification pass
    # (profiles ride the closure), then the tiny (lang x pred) rollup —
    # zero corpus-sized shuffles
    "langid_trigram_confusion": ["MapInPandas", "!SortMergeJoin"],
    # one source-keyed agg with map-side combine; everything else map-side
    "corpus_source_report": ["!SortMergeJoin", "!MapInPandas", "!Window"],
    # prefix filter BEFORE the agg; TakeOrdered over the tiny completions
    "q3_suggest_terms": ["TakeOrderedAndProject", "!SortMergeJoin"],
    # queries broadcast into one corpus scan; per-anchor windows over <=20 rows
    "training_triplets": ["!SortMergeJoin", "!CartesianProduct"],
    # strata-sized count agg broadcast back; one narrow corpus scan
    "sample_temperature_mixture": ["BroadcastHashJoin", "!SortMergeJoin", "!MapInPandas"],
    # one scan of quality expressions -> source-keyed exact-percentile
    # agg -> tiny cut table broadcast back; no sort-merge, no Python
    "quality_adaptive_gate": ["BroadcastHashJoin", "!SortMergeJoin", "!MapInPandas"],
    # KN LM: one bigram explode + three vocab-sized count joins (AQE
    # broadcasts them at runtime) — no window, no UDF
    "kn_surprisal_score": ["!MapInPandas", "!Window"],
    # SymSpell: variant explode is map-side (Generate), query variants
    # + verified weights broadcast, final rank is TakeOrdered — never a
    # vocab x query cross product
    "q3_fuzzy_search": [
        "TakeOrderedAndProject",
        "BroadcastHashJoin",
        "!CartesianProduct",
        "!MapInPandas",
    ],
    # matryoshka sweep (r13): batched GEMM with per-batch top-k — ONE
    # corpus scan for all dims x queries at BLAS rate (the
    # dedup_embedding_cosine idiom; MapInPandas lives ABOVE the topk
    # checkpoint so the audited tail shows only the recall join —
    # the quality_linear_probe precedent); the BNLJ crossJoin is gone
    "embedding_matryoshka_recall": [
        "BroadcastHashJoin",
        "!SortMergeJoin",
        "!BroadcastNestedLoopJoin",
    ],
    # link prediction downstream of the checkpointed pair scan: wedge
    # self-join + anti-join + degree joins, top-k without global sort.
    # DELIBERATE exemption (VERDICT r10): this is the ONE catalog query
    # allowed both a SortMergeJoin and an unpushed filter. The wedge
    # self-join is legitimately large-large (both sides are the Σdeg²
    # pair stream — no broadcastable side exists by construction, and
    # the volume is already bounded upstream by the Σdeg² wedge budget
    # probe / center_cap in common_neighbor_counts), and the
    # non-adjacency anti-join predicate cannot push into the parquet
    # scan because it references the join output, not a base column.
    # If a future regression adds a SMJ anywhere ELSE in this plan it
    # will still surface here: the expectation below pins TakeOrdered +
    # no-cartesian + no-pandas, and PLANS.md records Exchange counts
    # per round for drift review.
    "graph_link_prediction": [
        "TakeOrderedAndProject",
        "!MapInPandas",
        "!CartesianProduct",
    ],
    # Holt smoothing: per-series applyInPandas (FlatMapGroupsInPandas,
    # the deliberate pandas stage) over a (type, day) pre-aggregate —
    # no join, no window
    "events_holt_forecast": ["!SortMergeJoin", "!Window", "!CartesianProduct"],
    # top paths: ONE user-keyed window (rank-filtered to <=5 rows/user
    # before any agg), path-keyed count, TakeOrdered
    "events_top_paths": [
        "TakeOrderedAndProject",
        "!SortMergeJoin",
        "!MapInPandas",
    ],
}


def audit(spark, names=None, verbose=True):
    """Build each named entry's physical plan at sf0.01 and check its
    EXPECT assertions. Returns (failures, report_lines). Shared by the
    CLI (full map -> PLANS.md) and tests/test_plan_regress.py (fast
    lazy-construction subset inside the pytest gate)."""
    from ai_vector_database_converstion_from_pdf_spark import catalog

    qs = catalog.queries()
    out = ["# PLANS — physical-plan audit (sf0.01)\n"]
    failures = []
    for name in names or EXPECT:
        wants = EXPECT[name]
        df = qs[name](spark, SF)
        qe = df._jdf.queryExecution()
        plan = qe.executedPlan().toString() + "\n" + qe.toString()
        marks = {
            "TakeOrdered": "TakeOrderedAndProject" in plan,
            "BroadcastHJ": "BroadcastHashJoin" in plan,
            "SortMergeJ": "SortMergeJoin" in plan,
            "BroadcastNLJ": "BroadcastNestedLoopJoin" in plan,
            "PandasUDF": "MapInPandas" in plan or "FlatMapGroupsInPandas" in plan,
            "Pushed": "PushedFilters: [" in plan and "PushedFilters: []" not in plan.replace("PushedFilters: [", "PF["),
            "Exchanges": plan.count("Exchange"),
        }
        # "!X" asserts X must NOT appear in the plan
        missing = [
            w
            for w in wants
            if ((w[1:] in plan) if w.startswith("!") else (w not in plan))
        ]
        status = "OK" if not missing else f"MISSING {missing}"
        if missing:
            failures.append(name)
        out.append(f"## {name} — {status}\n\n`{marks}`\n")
        if verbose:
            print(name, status, marks)
    return failures, out


def main() -> int:
    from ai_vector_database_converstion_from_pdf_spark.session import get_spark

    spark = get_spark("plan-audit", cpus=8)
    failures, out = audit(spark)
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
