"""Hand-computed semantics for the fifth-session additions: Kneser-Ney
bigram surprisal, SymSpell fuzzy term search, matryoshka truncation
recall, and common-neighbor link prediction (tests/test_catalog_oracle.py
covers their DuckDB parity; these pin the math independently on
constructed inputs)."""

import math

import pytest

from ai_vector_database_converstion_from_pdf_spark.operators.graph import (
    common_neighbor_counts,
    link_prediction,
    triangle_counts,
    triangle_counts_from_cn,
)
from ai_vector_database_converstion_from_pdf_spark.operators.keyword import (
    deletion_variants,
    fuzzy_search,
)
from ai_vector_database_converstion_from_pdf_spark.operators.similarity import (
    matryoshka_recall,
)
from ai_vector_database_converstion_from_pdf_spark.operators.textstats import (
    kn_bigram_surprisal,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


class TestKnSurprisal:
    def test_hand_computed_kn(self, spark):
        # corpus: doc0 = "a b a b", doc1 = "a c".
        # bigrams: (a b) x2, (b a) x1, (a c) x1  -> 4 tokens of bigram
        # events, 3 distinct types (B=3).
        # contexts: a: cc=3, n1p=2 (ab, ac); b: cc=1, n1p=1 (ba).
        # continuations: b: nc=1 (a_); a: nc=1 (b_); c: nc=1 (a_).
        docs = _docs(spark, [(0, "a b a b"), (1, "a c")])
        out = {r["doc_id"]: r for r in kn_bigram_surprisal(docs).collect()}
        D, B = 0.75, 3.0

        def p(cb, cc, n1p, nc):
            return ((cb - D) / cc) + ((D * n1p / cc) * (nc / B))

        p_ab = p(2, 3, 2, 1)  # P(b|a)
        p_ba = p(1, 1, 1, 1)  # P(a|b)
        p_ac = p(1, 3, 2, 1)  # P(c|a)
        exp0 = -(math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3.0
        exp1 = -math.log(p_ac)
        assert out[0]["n_bigrams"] == 3
        assert out[1]["n_bigrams"] == 1
        assert out[0]["mean_kn_surprisal"] == pytest.approx(exp0, abs=1e-6)
        assert out[1]["mean_kn_surprisal"] == pytest.approx(exp1, abs=1e-6)

    def test_probabilities_sum_below_one(self, spark):
        # KN leaves mass on the discount: for a fixed context, the
        # assigned probabilities of SEEN continuations sum to < 1
        # (add-1 with full vocab would too, but KN must not exceed it).
        docs = _docs(spark, [(0, "x y x z x y")])
        out = kn_bigram_surprisal(docs).collect()[0]
        assert out["n_bigrams"] == 5
        assert out["mean_kn_surprisal"] > 0.0

    def test_short_docs_drop(self, spark):
        docs = _docs(spark, [(0, "solo"), (1, "a b")])
        got = {r["doc_id"] for r in kn_bigram_surprisal(docs).collect()}
        assert got == {1}


class TestFuzzySearch:
    def test_deletion_variants(self):
        assert deletion_variants("ab") == ["a", "ab", "b"]
        assert "mrge" in deletion_variants("merge")  # 1 deletion away

    def test_typo_finds_term(self, spark):
        docs = _docs(
            spark,
            [(0, "merge the tables"), (1, "join the queue"), (2, "nothing here")],
        )
        out = {
            r["id"]: (r["score_micro"], r["n_terms"])
            for r in fuzzy_search(
                docs, ["mrge", "jion"], 10, id_col="doc_id", text_col="text"
            ).collect()
        }
        # doc0 matches "merge" via lev 1 -> 500000; "the" is lev 2 from
        # neither qterm's neighborhood (no shared deletion variant).
        assert out[0] == (500000, 1)
        # doc1 matches "join" via transposition (lev 2, shared variant
        # "jon"/"jin") -> 333333.
        assert out[1] == (333333, 1)
        assert 2 not in out

    def test_exact_match_dominates(self, spark):
        docs = _docs(spark, [(0, "merge now"), (1, "marge now")])
        out = [
            (r["id"], r["score_micro"])
            for r in fuzzy_search(
                docs, ["merge"], 10, id_col="doc_id", text_col="text"
            ).collect()
        ]
        # exact (lev 0) = 1_000_000 ranks above substitution (lev 1)
        assert out == [(0, 1000000), (1, 500000)]

    def test_beyond_max_edit_excluded(self, spark):
        docs = _docs(spark, [(0, "zebra crossing")])
        out = fuzzy_search(
            docs, ["query"], 10, id_col="doc_id", text_col="text"
        ).collect()
        assert out == []

    def test_distance2_pure_insertions_found(self, spark):
        """ADVICE r6: depth-1 blocking missed lev-2 pairs needing two
        deletions on ONE side — "jo" reaches "join" only via the corpus
        term losing both 'i' and 'n'. Depth-2 symmetric delete covers it."""
        docs = _docs(spark, [(0, "join the tables"), (1, "nothing relevant")])
        out = {
            r["id"]: r["score_micro"]
            for r in fuzzy_search(
                docs, ["jo"], 10, id_col="doc_id", text_col="text"
            ).collect()
        }
        assert out[0] == 333333  # join @ lev 2
        assert 1 not in out


class TestMatryoshkaRecall:
    def test_prefix_geometry(self, spark):
        # 4-dim vectors, full width 4, truncation 2. In the 2-dim
        # prefix, v2 looks identical to v0's direction; full width
        # separates them.
        emb = spark.createDataFrame(
            [
                (0, [1.0, 0.0, 0.0, 0.0], "a"),
                (1, [1.0, 0.0, 0.1, 0.0], "a"),
                (2, [1.0, 0.0, 0.0, 1.0], "a"),
                (3, [0.0, 1.0, 0.0, 0.0], "a"),
            ],
            "vec_id long, embedding array<float>, label string",
        )
        out = {
            r["dim"]: r
            for r in matryoshka_recall(
                emb, n_queries=2, dims=(2, 4), k=2
            ).collect()
        }
        # full width is its own ground truth
        assert out[4]["recall"] == 1.0
        assert out[4]["n_overlap"] == 4
        # prefix-2 recall is <= 1 and deterministic on this geometry:
        # q0 full top-2 = {0, 1}; prefix-2 scores 0,1,2 all tie at 1.0
        # -> tie-break by vec_id keeps {0, 1}: hit.
        # q1 full top-2 = {1, 0}; prefix-2 keeps {0, 1}: hit.
        assert out[2]["recall"] == 1.0

    def test_truncation_loses_neighbor(self, spark):
        # q0's full-width nearest neighbor differs from its prefix-2
        # nearest: vec 1 matches in dims 3-4 only.
        emb = spark.createDataFrame(
            [
                (0, [1.0, 0.0, 1.0, 1.0], "a"),
                (1, [0.0, 0.1, 1.0, 1.0], "a"),
                (2, [1.0, 0.0, -1.0, -1.0], "a"),
            ],
            "vec_id long, embedding array<float>, label string",
        )
        out = {
            r["dim"]: r["n_overlap"]
            for r in matryoshka_recall(
                emb, n_queries=1, dims=(2, 4), k=2
            ).collect()
        }
        # full top-2 for q0: {0, 1} (cos(0,1)=2/sqrt(3*2.01)=0.81 >
        # cos(0,2)=-1/3). prefix-2 top-2: {0, 2} (cos=1.0) over 1
        # (cos=0). overlap = {0} -> 1 of 2.
        assert out[4] == 2
        assert out[2] == 1

    def test_scan_budget_sampling_engages(self, spark):
        """Over-budget corpora are evaluated on a deterministic sample:
        query rows always kept (self-match semantics), dim=max stays
        recall 1.0 by construction, and the run is repeatable."""
        emb = spark.createDataFrame(
            [(i, [float(i % 7), 1.0, float(i % 3), 0.5], "a") for i in range(60)],
            "vec_id long, embedding array<float>, label string",
        )
        kw = dict(n_queries=3, dims=(2, 4), k=2, max_scan_flops=100.0)
        a = {r["dim"]: r for r in matryoshka_recall(emb, **kw).collect()}
        b = {r["dim"]: r for r in matryoshka_recall(emb, **kw).collect()}
        assert a[4]["recall"] == 1.0  # full width is its own truth
        assert {d: r["n_overlap"] for d, r in a.items()} == {
            d: r["n_overlap"] for d, r in b.items()
        }
        # under-budget call is exact and may differ from the sampled one
        exact = {
            r["dim"]: r
            for r in matryoshka_recall(
                emb, n_queries=3, dims=(2, 4), k=2
            ).collect()
        }
        assert exact[4]["recall"] == 1.0


class TestLinkPrediction:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(
            [(a, b) for a, b in pairs], "id_a long, id_b long"
        )

    def test_path_graph_predicts_endpoints(self, spark):
        # path 1-2-3: only non-adjacent pair sharing a neighbor is (1,3)
        # via center 2. deg(1)=deg(3)=1, cn=1 -> jaccard 1/(1+1-1)=1.
        out = link_prediction(self._edges(spark, [(1, 2), (2, 3)])).collect()
        assert [(r["id_a"], r["id_b"], r["cn"], r["jaccard"]) for r in out] == [
            (1, 3, 1, 1.0)
        ]

    def test_adjacent_pairs_excluded(self, spark):
        # triangle 1-2-3: every pair is an edge -> nothing to predict.
        out = link_prediction(
            self._edges(spark, [(1, 2), (1, 3), (2, 3)])
        ).collect()
        assert out == []

    def test_jaccard_ranks_shared_neighborhood(self, spark):
        # K1,3 star: leaves (2,3), (2,4), (3,4) each share hub 1.
        # deg(leaf)=1 -> jaccard 1.0 each; plus a pendant 5-2 edge makes
        # deg(2)=2, so pairs with 2 score 1/(2+1-1)=0.5, pair (3,4)
        # stays 1.0 and ranks first.
        out = link_prediction(
            self._edges(spark, [(1, 2), (1, 3), (1, 4), (2, 5)])
        ).collect()
        top = out[0]
        assert (top["id_a"], top["id_b"], top["jaccard"]) == (3, 4, 1.0)
        scores = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}
        assert scores[(2, 3)] == 0.5
        assert scores[(2, 4)] == 0.5
        # (1,5) share neighbor 2: deg(1)=3, deg(5)=1 -> 1/3
        assert scores[(1, 5)] == pytest.approx(0.333333, abs=1e-6)

    def test_auto_under_budget_is_exact(self, spark):
        # default budget (5e8) dwarfs this graph: auto must be
        # byte-identical to the ungated legacy plan
        pairs = [(i, j) for i in range(1, 8) for j in range(i + 1, 8) if (i + j) % 3]
        exact = link_prediction(
            self._edges(spark, pairs), center_cap=None
        ).collect()
        auto = link_prediction(
            self._edges(spark, pairs), center_cap="auto"
        ).collect()
        assert auto == exact and len(exact) > 0

    def test_auto_over_budget_caps_hub_centers(self, spark):
        # hub-heavy star K1,40: sum(deg^2) = 40^2 + 40 = 1640 > budget 100
        # -> cap = max(2, floor(sqrt(100/41))) = 2: the hub center emits
        # wedges over only 2 of its 40 leaves, so at most C(2,2)=1
        # candidate pair survives instead of C(40,2)=780.
        star = self._edges(spark, [(1, i) for i in range(2, 42)])
        out = link_prediction(
            star, top_k=1000, center_cap="auto", auto_wedge_budget=100
        ).collect()
        assert 1 <= len(out) < 780
        # full-graph degrees in the denominator, never capped ones
        for r in out:
            assert r["deg_a"] == 1 and r["deg_b"] == 1
            assert r["cn"] == 1 and r["jaccard"] == 1.0
        # deterministic: the stable-hash neighbor pick gives the same
        # rows on a re-run
        again = link_prediction(
            star, top_k=1000, center_cap="auto", auto_wedge_budget=100
        ).collect()
        assert again == out

    def test_capped_scores_are_lower_bounds(self, spark):
        # K5 minus edge (4,5): exact cn for the missing pair is 3 (via
        # centers 1,2,3). An explicit cap of 2 can only shrink cn, and
        # degrees stay full-graph, so every capped score <= exact score.
        pairs = [(1, 2), (1, 3), (1, 4), (1, 5), (2, 3), (2, 4), (2, 5), (3, 4), (3, 5)]
        exact = {
            (r["id_a"], r["id_b"]): (r["cn"], r["jaccard"])
            for r in link_prediction(
                self._edges(spark, pairs), center_cap=None
            ).collect()
        }
        capped = link_prediction(
            self._edges(spark, pairs), center_cap=2
        ).collect()
        assert exact[(4, 5)][0] == 3
        for r in capped:
            e_cn, _ = exact[(r["id_a"], r["id_b"])]
            assert r["cn"] <= e_cn
            assert r["deg_a"] == 4 and r["deg_b"] == 4

    def test_bad_cap_rejected(self, spark):
        with pytest.raises(ValueError):
            link_prediction(
                self._edges(spark, [(1, 2)]), center_cap=0
            ).collect()


class TestSharedWedgeStage:
    """The r9 shared wedge memo (VERDICT r8 #2): ONE pair-level
    common-neighbor table serves both link prediction (non-adjacent
    pairs) and triangle counting (adjacent pairs; per-node triangles =
    half the sum of incident-edge cn). These pin the algebra on
    constructed graphs against the standalone operators."""

    def _edges(self, spark, pairs):
        return spark.createDataFrame(
            [(a, b) for a, b in pairs], "id_a long, id_b long"
        )

    # K5 minus edge (4,5), plus a pendant 6-1: mixes triangles, open
    # wedges, degree asymmetry
    PAIRS = [
        (1, 2), (1, 3), (1, 4), (1, 5), (2, 3),
        (2, 4), (2, 5), (3, 4), (3, 5), (1, 6),
    ]

    def test_cn_includes_adjacent_and_nonadjacent_pairs(self, spark):
        cn = {
            (r["id_a"], r["id_b"]): r["cn"]
            for r in common_neighbor_counts(
                self._edges(spark, self.PAIRS)
            ).collect()
        }
        # adjacent pair (1,2): common neighbors {3,4,5} -> 3 (its
        # triangle-through-edge count)
        assert cn[(1, 2)] == 3
        # non-adjacent pair (4,5): centers {1,2,3} -> 3
        assert cn[(4, 5)] == 3
        # non-adjacent pair (2,6): only center 1
        assert cn[(2, 6)] == 1

    def test_triangles_from_cn_match_compact_forward(self, spark):
        edges = self._edges(spark, self.PAIRS)
        cn = common_neighbor_counts(edges)
        via_cn = sorted(
            map(tuple, triangle_counts_from_cn(cn, edges, with_degrees=True).collect())
        )
        direct = sorted(
            map(tuple, triangle_counts(edges, with_degrees=True).collect())
        )
        assert via_cn == direct and len(direct) == 6  # all nodes, 6 zero-filled

    def test_link_prediction_from_shared_cn_is_byte_identical(self, spark):
        edges = self._edges(spark, self.PAIRS)
        cn = common_neighbor_counts(edges)
        shared = link_prediction(edges, top_k=50, cn_pairs=cn).collect()
        standalone = link_prediction(edges, top_k=50, center_cap=None).collect()
        assert shared == standalone and len(shared) > 0


class TestHoltForecast:
    def _daily(self, spark, rows):
        return spark.createDataFrame(rows, "event_type string, x long, y long")

    def test_hand_computed_recursion(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.forecast import (
            holt_linear,
        )

        # series 10, 20, 30 with a=B=0.5:
        # l1=10, b1=0
        # l2=.5*20+.5*10=15        b2=.5*(15-10)=2.5
        # l3=.5*30+.5*17.5=23.75   b3=.5*(23.75-15)+.5*2.5=5.625
        out = holt_linear(
            self._daily(spark, [("a", 1, 10), ("a", 2, 20), ("a", 3, 30)]),
            horizon=7,
        ).collect()[0]
        assert out["n_days"] == 3
        assert out["level"] == 23.75
        assert out["trend"] == 5.625
        assert out["forecast"] == 23.75 + 7 * 5.625

    def test_single_day_series(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.forecast import (
            holt_linear,
        )

        out = holt_linear(self._daily(spark, [("b", 5, 42)])).collect()[0]
        assert (out["level"], out["trend"], out["forecast"]) == (42.0, 0.0, 42.0)

    def test_order_insensitive_input(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.forecast import (
            holt_linear,
        )

        fwd = holt_linear(
            self._daily(spark, [("a", 1, 10), ("a", 2, 20), ("a", 3, 30)])
        ).collect()
        rev = holt_linear(
            self._daily(spark, [("a", 3, 30), ("a", 1, 10), ("a", 2, 20)])
        ).collect()
        assert fwd == rev


class TestTopPaths:
    def test_first5_path_and_ranking(self, spark):
        import datetime

        from ai_vector_database_converstion_from_pdf_spark.catalog import (
            events_top_paths,
        )

        # build a parquet fixture dir so the catalog entry can read it
        rows = []
        eid = 0
        t0 = datetime.datetime(2024, 1, 1)
        # users 1,2 share view>click; user 3 has 7 events (only first 5
        # count); user 4 ties on ts -> event_id breaks the tie
        for uid, seq in [
            (1, ["view", "click"]),
            (2, ["view", "click"]),
            (3, ["a", "b", "c", "d", "e", "f", "g"]),
        ]:
            for i, et in enumerate(seq):
                rows.append((eid, t0 + datetime.timedelta(minutes=i), uid, et, 1.0, "{}"))
                eid += 1
        rows.append((100, t0, 4, "z_second", 1.0, "{}"))
        rows.append((99, t0, 4, "a_first", 1.0, "{}"))
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            ev.write.parquet(f"{d}/events.parquet")
            out = {
                r["path"]: r["n_users"]
                for r in events_top_paths(spark, d).collect()
            }
        assert out["view>click"] == 2
        assert out["a>b>c>d>e"] == 1  # capped at first 5
        assert out["a_first>z_second"] == 1  # event_id tie-break


class TestMatchFuzzyDispatch:
    def test_tilde_routes_to_fuzzy(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.keyword import (
            match_search,
        )

        df = spark.createDataFrame(
            [(0, "merge the tables"), (1, "marge the tables"), (2, "other text")],
            "id long, text string",
        )
        out = {r["id"]: r["score_micro"] for r in match_search(df, "merge~", 10).collect()}
        assert out[0] == 1000000 and out[1] == 500000 and 2 not in out

    def test_unmarked_terms_stay_exact(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.keyword import (
            match_search,
        )

        df = spark.createDataFrame(
            [(0, "merge tables"), (1, "marge tables"), (2, "merge")],
            "id long, text string",
        )
        # "merge~" is fuzzy (matches marge at lev 1); "tables" exact-only
        out = {
            r["id"]: (r["score_micro"], r["n_terms"])
            for r in match_search(df, "merge~ tables", 10).collect()
        }
        assert out[0] == (2000000, 2)   # exact merge + exact tables
        assert out[1] == (1500000, 2)   # fuzzy marge + exact tables
        assert out[2] == (1000000, 1)   # exact merge only
        # kw_score contract for the CLI front door
        row = match_search(df, "merge~", 10).collect()[0]
        assert row["kw_score"] == 0.5

    def test_empty_variant_links_short_terms(self, spark):
        # depth-2 completeness for degenerate short strings (ADVICE r7):
        # query "jo" and corpus term "ab" are Levenshtein 2 apart but
        # share ONLY the empty-string deletion variant — dropping ''
        # from either side silently loses the pair.
        from ai_vector_database_converstion_from_pdf_spark.operators.keyword import (
            fuzzy_search,
        )

        df = spark.createDataFrame(
            [(0, "ab ab"), (1, "unrelated words")], "id long, text string"
        )
        out = {
            r["id"]: r["score_micro"]
            for r in fuzzy_search(df, ["jo"], 10).collect()
        }
        assert out == {0: 1000000 // 3}  # lev("ab","jo") = 2


class TestMatryoshkaFunnel:
    def test_funnel_matches_bruteforce_when_prefix_good(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.semantic import (
            semantic_topk,
        )
        from ai_vector_database_converstion_from_pdf_spark.operators.similarity import (
            matryoshka_funnel_topk,
        )

        import numpy as np

        rng = np.random.default_rng(7)
        vecs = rng.standard_normal((50, 8)).astype("float32")
        emb = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]], "a") for i in range(50)],
            "vec_id long, embedding array<float>, label string",
        )
        q = [float(x) for x in vecs[0]]
        # shortlist = corpus size -> funnel is EXACTLY brute force
        got = [
            (r["vec_id"], r["score"])
            for r in matryoshka_funnel_topk(
                emb, q, prefix_dim=4, shortlist=50, k=5
            ).collect()
        ]
        want = [
            (r["vec_id"], r["score"])
            for r in semantic_topk(emb, q, k=5).collect()
        ]
        assert got == want

    def test_small_shortlist_can_miss(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.similarity import (
            matryoshka_funnel_topk,
        )

        # vec 1 is the true full-width nearest of q but its prefix-2 is
        # orthogonal to q's -> a shortlist of 1 keeps only vec 2
        emb = spark.createDataFrame(
            [
                (1, [0.0, 1.0, 1.0, 1.0], "a"),
                (2, [1.0, 0.0, 0.1, 0.1], "a"),
            ],
            "vec_id long, embedding array<float>, label string",
        )
        q = [1.0, 0.0, 1.0, 1.0]
        out = matryoshka_funnel_topk(
            emb, q, prefix_dim=2, shortlist=1, k=1
        ).collect()
        assert [r["vec_id"] for r in out] == [2]
