"""Hand-computed semantics for the round-4 additions: directed shingle
containment, first/last-touch attribution, and token-budget selection
(tests/test_catalog_oracle.py covers their DuckDB parity; these pin the
math independently on constructed inputs)."""

import datetime

from ai_vector_database_converstion_from_pdf_spark.catalog import (
    events_attribution,
    token_budget_select,
)
from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
    containment_pairs,
)

UTC = datetime.timezone.utc


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (
                eid,
                datetime.datetime.fromtimestamp(ts, UTC).replace(tzinfo=None),
                uid,
                et,
                float(v),
                "{}",
            )
            for eid, ts, uid, et, v in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


class TestContainment:
    def test_asymmetric_quote_wrap(self, spark):
        # doc 1 = 6 tokens pasted verbatim inside doc 2's 14 tokens.
        # 3-gram shingles: S(1) = 4 shingles, all present in S(2) (12
        # shingles) -> C(1->2) = 1.0 but C(2->1) = 4/12 = 0.33 and
        # Jaccard = 4/12 = 0.33 — symmetric dedup at 0.8 misses it.
        inner = "alpha beta gamma delta epsilon zeta"
        docs = _docs(
            spark,
            [
                (1, inner, "s"),
                (2, f"one two three four {inner} five six seven eight", "s"),
            ],
        )
        out = {
            (r["id_contained"], r["id_container"]): r["containment"]
            for r in containment_pairs(docs, threshold=0.9).collect()
        }
        assert out == {(1, 2): 1.0}
        # both directions surface once the threshold drops below 4/12
        lo = {
            (r["id_contained"], r["id_container"]): r["containment"]
            for r in containment_pairs(docs, threshold=0.3).collect()
        }
        assert lo[(1, 2)] == 1.0
        assert abs(lo[(2, 1)] - round(4 / 12, 6)) < 1e-9

    def test_no_shared_shingles_no_pair(self, spark):
        docs = _docs(
            spark,
            [(1, "a b c d e", "s"), (2, "v w x y z", "s")],
        )
        assert containment_pairs(docs, threshold=0.0).count() == 0

    def test_hot_shingle_cap_drops_join_and_denominator(self, spark):
        # one shingle shared by 3 docs; cap=2 removes it from the join
        # AND from |S(A)|, so the remaining private shingles make the
        # docs non-candidates (no surviving shared shingle -> no pair).
        hot = "common common common common"  # shingles all hot (df=3)
        docs = _docs(
            spark,
            [
                (1, f"{hot} aa bb cc", "s"),
                (2, f"{hot} dd ee ff", "s"),
                (3, f"{hot} gg hh ii", "s"),
            ],
        )
        capped = containment_pairs(docs, threshold=0.0, max_doc_freq=2)
        assert capped.count() == 0
        # uncapped: the hot shingles connect all three docs
        assert containment_pairs(docs, threshold=0.0).count() > 0


class TestAttribution:
    def test_touch_matrix(self, spark, tmp_path):
        # user 1: view click purchase(5) click purchase(7)
        #   p1: first=view last=click ; p2: first=view last=click
        # user 2: purchase(3)  -> (none, none)
        # user 3: error purchase(2) purchase(4)
        #   both purchases: first=error last=error (the intervening
        #   purchase is NOT a touch)
        rows = [
            (1, 100, 1, "view", 0),
            (2, 110, 1, "click", 0),
            (3, 120, 1, "purchase", 5),
            (4, 130, 1, "click", 0),
            (5, 140, 1, "purchase", 7),
            (6, 100, 2, "purchase", 3),
            (7, 100, 3, "error", 0),
            (8, 110, 3, "purchase", 2),
            (9, 120, 3, "purchase", 4),
        ]
        d = tmp_path / "sf"
        _events(spark, rows).write.parquet(str(d / "events.parquet"))
        out = {
            (r["first_touch"], r["last_touch"]): (
                r["conversions"],
                r["revenue"],
            )
            for r in events_attribution(spark, str(d)).collect()
        }
        assert out == {
            ("view", "click"): (2, 12.0),
            ("none", "none"): (1, 3.0),
            ("error", "error"): (2, 6.0),
        }

    def test_same_ts_tie_broken_by_event_id(self, spark, tmp_path):
        # click and purchase share ts; event_id order places the click
        # BEFORE the purchase, so it is the last touch.
        rows = [
            (1, 100, 1, "view", 0),
            (2, 200, 1, "click", 0),
            (3, 200, 1, "purchase", 1),
        ]
        d = tmp_path / "sf"
        _events(spark, rows).write.parquet(str(d / "events.parquet"))
        [r] = events_attribution(spark, str(d)).collect()
        assert (r["first_touch"], r["last_touch"]) == ("view", "click")


class TestTokenBudget:
    def test_greedy_quality_prefix(self, spark, tmp_path):
        # source s: doc 1 quality 1.0 (5 distinct / 5), 5 tokens
        #           doc 2 quality 0.5 (2 distinct / 4), 4 tokens
        #           doc 3 quality 1.0, 390 tokens
        # order: (1.0, doc 1), (1.0, doc 3), (0.5, doc 2)
        # cum:    5, 395, 399 -> all within the 400 budget
        # source t: one 401-token doc -> cum 401 > 400, excluded
        big = " ".join(f"w{i}" for i in range(390))
        over = " ".join(f"x{i}" for i in range(401))
        docs = _docs(
            spark,
            [
                (1, "a b c d e", "s"),
                (2, "a a b b", "s"),
                (3, big, "s"),
                (4, over, "t"),
            ],
        )
        d = tmp_path / "sf"
        docs.write.parquet(str(d / "documents.parquet"))
        rows = token_budget_select(spark, str(d)).collect()
        got = {r["doc_id"]: (r["cum_tokens"], r["quality"]) for r in rows}
        assert got == {1: (5, 1.0), 3: (395, 1.0), 2: (399, 0.5)}

    def test_budget_cuts_lowest_quality_first(self, spark, tmp_path):
        # two 250-token docs in one source: only the higher-quality one
        # fits the 400 budget; doc_id breaks the quality tie elsewhere.
        hiq = " ".join(f"a{i}" for i in range(250))  # quality 1.0
        loq = " ".join(["dup"] * 250)  # quality 1/250
        docs = _docs(spark, [(1, loq, "s"), (2, hiq, "s")])
        d = tmp_path / "sf"
        docs.write.parquet(str(d / "documents.parquet"))
        rows = token_budget_select(spark, str(d)).collect()
        assert [r["doc_id"] for r in rows] == [2]
        assert rows[0]["cum_tokens"] == 250


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in rows],
        "vec_id long, embedding array<float>, label int",
    )


class TestMaxSim:
    def test_late_interaction_scores(self, spark, tmp_path):
        import math

        # doc 0 = vecs 0-4 (contains the three query vectors themselves
        # -> per-query max cos = 1.0 each, maxsim 3.0)
        # doc 1 = vecs 5-9: best-per-query 1.0 / 0.6 / cos(8deg off 45)
        r2 = math.sqrt(2) / 2
        rows = [
            (0, (1, 0)),
            (1, (0, 1)),
            (2, (r2, r2)),
            (3, (-1, 0)),
            (4, (0, -1)),
            (5, (1, 0)),
            (6, (0.8, 0.6)),
            (7, (-1, 0)),
            (8, (0, -1)),
            (9, (-0.6, -0.8)),
        ]
        d = tmp_path / "sf"
        _emb(spark, rows).write.parquet(str(d / "embeddings.parquet"))
        from ai_vector_database_converstion_from_pdf_spark.catalog import (
            maxsim_multi_vector,
        )

        out = [(r["doc_id"], r["maxsim"]) for r in
               maxsim_multi_vector(spark, str(d)).collect()]
        # doc1: q0 max=1.0 (vec5), q1 max=0.6 (vec6), q2 max=(0.8+0.6)*r2
        exp1 = round(1.0 + 0.6 + round((0.8 + 0.6) * r2, 6), 6)
        assert out == [(0, 3.0), (1, exp1)]


class TestMutualKnn:
    def test_one_way_hub_edges_excluded(self, spark, tmp_path):
        import itertools
        import math

        # vecs 0-3: tight cluster (0..3 deg) — each member's top-3 are
        # the other members. vec 4: hub at 45 deg — its top-3 are
        # cluster members, but no cluster member ranks the hub in ITS
        # top-3 -> all hub edges are one-way. vec 5 at 180 deg: below
        # the cosine floor entirely.
        def at(deg):
            a = math.radians(deg)
            return (math.cos(a), math.sin(a))

        rows = [(i, at(d)) for i, d in enumerate([0, 1, 2, 3, 45, 180])]
        d = tmp_path / "sf"
        _emb(spark, rows).write.parquet(str(d / "embeddings.parquet"))
        from ai_vector_database_converstion_from_pdf_spark.catalog import (
            mutual_knn_pairs,
        )

        got = {(r["id_a"], r["id_b"]) for r in
               mutual_knn_pairs(spark, str(d)).collect()}
        assert got == set(itertools.combinations(range(4), 2))


class TestWelch:
    def test_t_and_df_match_hand_computation(self, spark, tmp_path):
        import math

        # event 'x': control (even users) values [1,2,3]; treat (odd)
        # [2,4]. event 'y': control has a single row -> excluded.
        rows = [
            (1, 100, 2, "x", 1),
            (2, 110, 2, "x", 2),
            (3, 120, 4, "x", 3),
            (4, 100, 1, "x", 2),
            (5, 110, 3, "x", 4),
            (6, 100, 2, "y", 9),
            (7, 100, 1, "y", 1),
            (8, 110, 3, "y", 2),
        ]
        d = tmp_path / "sf"
        _events(spark, rows).write.parquet(str(d / "events.parquet"))
        from ai_vector_database_converstion_from_pdf_spark.catalog import (
            events_ab_welch,
        )

        out = {r["event_type"]: r for r in
               events_ab_welch(spark, str(d)).collect()}
        assert list(out) == ["x"]
        r = out["x"]
        n0, m0, v0 = 3, 2.0, 1.0
        n1, m1, v1 = 2, 3.0, 2.0
        se2 = v0 / n0 + v1 / n1
        t = (m1 - m0) / math.sqrt(se2)
        df = se2**2 / ((v0 / n0) ** 2 / (n0 - 1) + (v1 / n1) ** 2 / (n1 - 1))
        assert (r["n_control"], r["n_treat"]) == (3, 2)
        assert r["mean_diff"] == 1.0
        assert abs(r["t_welch"] - round(t, 6)) < 1e-9
        assert abs(r["df_welch"] - round(df, 6)) < 1e-9


class TestPrfExpansion:
    def test_expansion_pulls_in_termless_doc(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.keyword import (
            prf_expand_search,
        )

        # query "alpha beta": docs 1-3 are feedback; their only
        # non-query term is gamma -> expansion = {gamma}; doc 4 shares
        # NO original term but matches the expanded query; doc 5 never
        # matches.
        docs = _docs(
            spark,
            [
                (1, "alpha beta gamma", "s"),
                (2, "alpha beta gamma", "s"),
                (3, "alpha beta gamma", "s"),
                (4, "gamma zeta", "s"),
                (5, "delta epsilon", "s"),
            ],
        )
        out = [
            (r["id"], r["match_cnt"])
            for r in prf_expand_search(
                docs, "alpha beta", 20, id_col="doc_id", text_col="text"
            ).collect()
        ]
        assert out == [(1, 3), (2, 3), (3, 3), (4, 1)]

    def test_no_feedback_overlap_keeps_original_ranking(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.keyword import (
            prf_expand_search,
        )

        # feedback docs contain ONLY query terms -> no expansion
        # candidates; stage 2 == stage 1 ranking on the original terms.
        docs = _docs(
            spark,
            [(1, "alpha beta", "s"), (2, "alpha", "s"), (3, "zeta", "s")],
        )
        out = [
            (r["id"], r["match_cnt"])
            for r in prf_expand_search(
                docs, "alpha beta", 20, id_col="doc_id", text_col="text"
            ).collect()
        ]
        assert out == [(1, 2), (2, 1)]


class TestLeakageSafeSplit:
    def test_near_dups_share_split_where_plain_split_leaks(self, spark, tmp_path):
        from ai_vector_database_converstion_from_pdf_spark.catalog import (
            leakage_safe_split,
            train_val_test_split,
        )

        # ids 0..199 paired (2k, 2k+1) as near-identical docs (one token
        # appended -> jaccard > 0.8 on 3-gram shingles at this length).
        # Each pair gets its OWN token universe: a corpus-shared base
        # would make every base shingle hotter than the df cap (50) and
        # strip the pairs' entire overlap (test_hot_shingle_cap above).
        rows = []
        for k in range(100):
            base = " ".join(f"p{k}t{i}" for i in range(40))
            rows.append((2 * k, f"{base} pair{k}", "s"))
            rows.append((2 * k + 1, f"{base} pair{k} extra", "s"))
        docs = _docs(spark, rows)
        d = tmp_path / "sf"
        docs.write.parquet(str(d / "documents.parquet"))

        safe = {
            r["doc_id"]: (r["canonical_id"], r["split"])
            for r in leakage_safe_split(spark, str(d)).collect()
        }
        plain = {
            r["doc_id"]: r["split"]
            for r in train_val_test_split(spark, str(d)).collect()
        }
        # every pair: same split under the cluster-aware split
        for k in range(100):
            assert safe[2 * k][1] == safe[2 * k + 1][1]
        # and the doc_id-hash split DOES leak on this fixture (some pair
        # straddles splits) — the bug this entry exists to fix
        assert any(plain[2 * k] != plain[2 * k + 1] for k in range(100))
        # canonical is the min id of each pair cluster
        assert all(safe[2 * k][0] == safe[2 * k + 1][0] for k in range(100))


class TestSourceEmbeddingDrift:
    def test_two_orthogonal_sources(self, spark, tmp_path):
        import math

        from ai_vector_database_converstion_from_pdf_spark.catalog import (
            source_embedding_drift,
        )

        # source a: all docs on axis e0; source b: all on e1. Corpus
        # mean = (.5, .5, 0...) -> each source sits at cos 1/sqrt(2),
        # L2 = sqrt(.5^2 + .5^2) from the corpus centroid.
        def axis(i):
            v = [0.0] * 64
            v[i] = 1.0
            return v

        docs = _docs(
            spark,
            [(0, "x", "a"), (1, "y", "a"), (2, "z", "b"), (3, "w", "b")],
        )
        emb = _emb(
            spark, [(0, axis(0)), (1, axis(0)), (2, axis(1)), (3, axis(1))]
        )
        d = tmp_path / "sf"
        docs.write.parquet(str(d / "documents.parquet"))
        emb.write.parquet(str(d / "embeddings.parquet"))
        out = {
            r["source"]: (r["n_docs"], r["cos_to_corpus"], r["l2_to_corpus"])
            for r in source_embedding_drift(spark, str(d)).collect()
        }
        r2 = round(1 / math.sqrt(2), 6)
        assert out == {"a": (2, r2, r2), "b": (2, r2, r2)}

    def test_docs_without_embeddings_excluded(self, spark, tmp_path):
        from ai_vector_database_converstion_from_pdf_spark.catalog import (
            source_embedding_drift,
        )

        docs = _docs(spark, [(0, "x", "a"), (99, "y", "a")])
        emb = _emb(spark, [(0, [1.0] * 64)])
        d = tmp_path / "sf"
        docs.write.parquet(str(d / "documents.parquet"))
        emb.write.parquet(str(d / "embeddings.parquet"))
        [r] = source_embedding_drift(spark, str(d)).collect()
        # only doc 0 has a vector; its source centroid IS the corpus
        assert (r["source"], r["n_docs"], r["cos_to_corpus"]) == ("a", 1, 1.0)
        assert r["l2_to_corpus"] == 0.0


class TestContainmentAutoDispatch:
    def test_auto_equals_exact_under_budget(self, spark):
        docs = _docs(
            spark,
            [
                (1, "alpha beta gamma delta epsilon", "s"),
                (2, "alpha beta gamma delta epsilon zeta", "s"),
                (3, "one two three four five", "s"),
            ],
        )
        exact = sorted(
            map(tuple, containment_pairs(docs, threshold=0.5).collect())
        )
        auto = sorted(
            map(
                tuple,
                containment_pairs(
                    docs, threshold=0.5, max_doc_freq="auto"
                ).collect(),
            )
        )
        assert auto == exact and exact  # identical and non-vacuous

    def test_auto_applies_cap_over_budget(self, spark):
        # 12 identical docs -> every shingle df=12, exact bound
        # 3 shingles * C(12,2) = 198 > budget 100 -> cap 10 < 12 drops
        # everything (the logged degraded mode)
        docs = _docs(
            spark, [(i, "a b c d e", "s") for i in range(12)]
        )
        capped = containment_pairs(
            docs,
            threshold=0.0,
            max_doc_freq="auto",
            auto_pair_budget=100,
            auto_cap=10,
        )
        assert capped.count() == 0
        # and the same corpus under a raised budget is exact (all pairs)
        exact = containment_pairs(
            docs, threshold=0.0, max_doc_freq="auto", auto_pair_budget=10_000
        )
        assert exact.count() == 12 * 11  # directed pairs


class TestWelchZeroVariance:
    def test_constant_value_group_excluded(self, spark, tmp_path):
        # both variants constant (variance 0 on both sides): the t
        # statistic is undefined -> the group must be excluded, not
        # emitted as inf/NaN/null (engines disagree on x/0.0)
        rows = [
            (1, 100, 2, "x", 5),
            (2, 110, 2, "x", 5),
            (3, 100, 1, "x", 5),
            (4, 110, 1, "x", 5),
            # a healthy group to keep the result non-vacuous
            (5, 100, 2, "y", 1),
            (6, 110, 4, "y", 3),
            (7, 100, 1, "y", 2),
            (8, 110, 3, "y", 6),
        ]
        d = tmp_path / "sf"
        _events(spark, rows).write.parquet(str(d / "events.parquet"))
        from ai_vector_database_converstion_from_pdf_spark.catalog import (
            events_ab_welch,
        )

        out = [r["event_type"] for r in events_ab_welch(spark, str(d)).collect()]
        assert out == ["y"]


class TestAssocLift:
    def test_hand_computed_lift(self, spark, tmp_path):
        # users 1,2: {a, b}; user 3: {a}; user 4: {c}
        # N=4; n_a=3, n_b=2, n_c=1; n_both(a,b)=2
        # support(a,b)=0.5; conf(a->b)=2/3; conf(b->a)=1.0
        # lift = 2*4/(3*2) = 4/3 both directions
        rows = [
            (1, 100, 1, "a", 0), (2, 110, 1, "b", 0),
            (3, 100, 2, "a", 0), (4, 110, 2, "b", 0),
            (5, 100, 3, "a", 0),
            (6, 100, 4, "c", 0),
        ]
        d = tmp_path / "sf"
        _events(spark, rows).write.parquet(str(d / "events.parquet"))
        from ai_vector_database_converstion_from_pdf_spark.catalog import (
            events_assoc_lift,
        )

        out = {
            (r["type_a"], r["type_b"]): (
                r["n_both"], r["support"], r["confidence"], r["lift"]
            )
            for r in events_assoc_lift(spark, str(d)).collect()
        }
        lift = round(4 / 3, 6)
        assert out == {
            ("a", "b"): (2, 0.5, round(2 / 3, 6), lift),
            ("b", "a"): (2, 0.5, 1.0, lift),
        }
        # c co-occurs with nothing -> no rows for c
        assert not any("c" in k for k in out)


class TestBfsHops:
    def test_path_graph_levels_and_cap(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.graph import (
            bfs_hops,
        )

        # path 1-2-3-4-5-6-7 plus isolated 9; seeds {1, 9}
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7)],
            "id_a long, id_b long",
        )
        seeds = spark.createDataFrame([(1,), (9,)], "id long")
        out = {r["id"]: r["hops"] for r in bfs_hops(edges, seeds, 4).collect()}
        # node 6 is 5 hops away -> outside the cap; isolated seed stays 0
        assert out == {1: 0, 9: 0, 2: 1, 3: 2, 4: 3, 5: 4}

    def test_min_hops_on_diamond(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.graph import (
            bfs_hops,
        )

        # 1-2, 1-3, 2-4, 3-4, 4-5: two equal paths to 4 (2 hops), one
        # discovery — and 5 at 3 hops through either
        edges = spark.createDataFrame(
            [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)], "id_a long, id_b long"
        )
        seeds = spark.createDataFrame([(1,)], "id long")
        out = {r["id"]: r["hops"] for r in bfs_hops(edges, seeds, 4).collect()}
        assert out == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3}


class TestTimeToConvert:
    def test_hand_computed_cohort(self, spark, tmp_path):
        # week epoch of 1970-01-01-era stamps: all in one cohort.
        # user 1: view@100, purchase@3700 -> 1.0h
        # user 2: view@100, purchase@100  -> 0.0h (same instant counts)
        # user 3: view@100, no purchase -> viewer only
        # user 4: purchase@50 BEFORE any view, view@100 -> not converted
        # p50 of [0.0, 1.0] = 0.5; p90 = 0.9; rate = 2/4
        rows = [
            (1, 100, 1, "view", 0), (2, 3700, 1, "purchase", 1),
            (3, 100, 2, "view", 0), (4, 100, 2, "purchase", 1),
            (5, 100, 3, "view", 0),
            (6, 50, 4, "purchase", 1), (7, 100, 4, "view", 0),
        ]
        d = tmp_path / "sf"
        _events(spark, rows).write.parquet(str(d / "events.parquet"))
        from ai_vector_database_converstion_from_pdf_spark.catalog import (
            events_time_to_convert,
        )

        [r] = events_time_to_convert(spark, str(d)).collect()
        assert r["n_converted"] == 2
        assert r["conversion_rate"] == 0.5
        assert r["p50_hours"] == 0.5
        assert r["p90_hours"] == 0.9


class TestLangidConfusion:
    def test_matrix_and_shares(self, spark, tmp_path):
        from ai_vector_database_converstion_from_pdf_spark.catalog import (
            langid_confusion,
        )

        # two labeled-en docs: one with english markers (-> en), one
        # with no markers (-> und); one labeled-es doc with spanish
        # markers (-> es). (_docs hardcodes lang='en', so build raw.)
        rows = [(1, "the quick fox and the dog", "en", "s", 1),
                (2, "zzz qqq www", "en", "s", 1),
                (3, "el perro y la casa que", "es", "s", 1)]
        docs = spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        d = tmp_path / "sf"
        docs.write.parquet(str(d / "documents.parquet"))
        out = {
            (r["lang"], r["lang_pred"]): (r["n"], r["frac_of_lang"])
            for r in langid_confusion(spark, str(d)).collect()
        }
        assert out == {
            ("en", "en"): (1, 0.5),
            ("en", "und"): (1, 0.5),
            ("es", "es"): (1, 1.0),
        }
