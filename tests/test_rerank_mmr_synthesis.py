"""Unit tests for the driver-side sequential operators: rerank calibration
(R2-R4), MMR (Q11), exploration (Q12), synthesis clustering + claim
validation (Y1-Y3), and the deterministic embedder (I16)."""

import math

from ai_vector_database_converstion_from_pdf_spark.functions.embed import (
    check_dimension,
    hash_embed,
)
from ai_vector_database_converstion_from_pdf_spark.operators.mmr import (
    MmrState,
    doc_entropy,
    exploration_inject,
    mmr_lambda,
    mmr_select,
)
from ai_vector_database_converstion_from_pdf_spark.operators.rerank import (
    Calibrator,
    rerank_rows,
    stub_score,
)
from ai_vector_database_converstion_from_pdf_spark.operators.synthesis import (
    SourceContext,
    greedy_cluster,
    parse_claims,
    synthesize,
)


class TestCalibrator:
    def test_first_batch_seeds_stats(self):
        c = Calibrator()
        c.update_stats([0.2, 0.4, 0.6])
        assert abs(c.mean - 0.4) < 1e-9
        assert c.sample_count == 1

    def test_ema_update(self):
        c = Calibrator()
        c.update_stats([0.4, 0.4])  # mean=0.4
        c.update_stats([0.8, 0.8])  # mean = .85*.4 + .15*.8 = 0.46
        assert abs(c.mean - 0.46) < 1e-9

    def test_drift_resets(self):
        c = Calibrator(mean=0.2, std=0.05, sample_count=10)
        c.update_stats([0.9, 0.9])  # drift 0.7 > 0.4 → reset → seed 0.9
        assert abs(c.mean - 0.9) < 1e-9
        assert "drift-reset" in c.anomalies

    def test_outlier_rejected_and_clamped(self):
        c = Calibrator(mean=0.5, std=0.1, sample_count=10)
        assert c.normalize(2.0) is None  # z=15 → outlier
        hi = c.normalize(0.9)  # z=4 → clamp 3 → sigmoid(3)
        assert abs(hi - 1 / (1 + math.exp(-3))) < 1e-9

    def test_frozen_model_skips_calibration(self):
        # the reference's consistency check is variance AROUND 0.5
        # (gemini_api.cpp:202-208): all-0.5 scores flag a frozen model
        c = Calibrator()
        rows = [{"id": i, "text": f"t{i}", "score": 1.0} for i in range(3)]
        rerank_rows("q", rows, calibrator=c, scorer=lambda q, t: 0.5)
        assert "frozen-model" in c.anomalies
        assert c.sample_count == 0

    def test_kv_roundtrip(self):
        c = Calibrator(mean=0.3, std=0.2, sample_count=7)
        kv = c.to_kv("m")
        c2 = Calibrator.from_kv("m", kv)
        assert c2.mean == 0.3 and c2.std == 0.2 and c2.sample_count == 10

    def test_empty_rerank_falls_back_to_original(self):
        c = Calibrator(mean=0.5, std=0.0001, sample_count=10)  # all outliers
        rows = [{"id": 1, "text": "alpha beta", "score": 0.9},
                {"id": 2, "text": "gamma delta", "score": 0.8}]
        out = rerank_rows("unrelated query terms", rows, calibrator=c)
        assert [r["id"] for r in out] == [1, 2]  # original order preserved


class TestMmr:
    ROWS = [
        {"doc_id": "a", "heading_path": "h1", "score": 1.0},
        {"doc_id": "a", "heading_path": "h1", "score": 0.9},
        {"doc_id": "b", "heading_path": "h2", "score": 0.85},
        {"doc_id": "a", "heading_path": "h3", "score": 0.84},
    ]

    def test_lambda_clamped(self):
        assert mmr_lambda("one two", "general") == 0.2  # low complexity
        assert mmr_lambda(" ".join(["w"] * 20), "summary") == 0.8

    def test_entropy(self):
        assert doc_entropy([{"doc_id": "a"}, {"doc_id": "b"}]) == 1.0
        assert doc_entropy([{"doc_id": "a"}, {"doc_id": "a"}]) == 0.0

    def test_diversity_preferred_at_low_lambda(self):
        sel, pen = mmr_select(list(self.ROWS), 3, lam=0.2, avg_entropy=0.0)
        # top-1 kept, then diverse doc b beats same-doc 0.9
        assert sel[0]["score"] == 1.0
        assert sel[1]["doc_id"] == "b"
        assert pen > 0

    def test_high_lambda_keeps_relevance_order(self):
        sel, _ = mmr_select(list(self.ROWS), 3, lam=0.8, avg_entropy=1.1)
        assert [r["score"] for r in sel] == [1.0, 0.9, 0.85]

    def test_ema_state(self):
        st = MmrState()
        st.update_entropy(1.0)
        assert abs(st.avg_doc_entropy - 0.3) < 1e-9
        st.session_search_count = 10
        st.update_entropy(1.0)
        assert abs(st.avg_doc_entropy - (0.1 + 0.9 * 0.3)) < 1e-9


class TestExploration:
    FINAL = [{"score": 0.8, "doc_id": "x"}, {"score": 0.7, "doc_id": "y"}]
    SEM = [{"score": 0.9, "trust_score": 1.0}] * 5 + [
        {"score": 0.7, "trust_score": 1.0},   # beyond limit, sim > 0.65 → probe
    ]

    def test_injects_at_position_2(self):
        out, injected = exploration_inject(
            list(self.FINAL), list(self.SEM), limit=5, stability=0.9, intent="general"
        )
        assert injected
        assert out[1]["is_exploration"] is True
        assert abs(out[1]["score"] - 0.8 * 0.95) < 1e-9

    def test_gated_by_stability_and_intent(self):
        out, injected = exploration_inject(
            list(self.FINAL), list(self.SEM), 5, stability=0.5, intent="general"
        )
        assert not injected
        out, injected = exploration_inject(
            list(self.FINAL), list(self.SEM), 5, stability=0.9, intent="definition"
        )
        assert not injected


class TestSynthesis:
    def test_greedy_cluster_order_dependence(self):
        # 0-1 similar, 1-2 similar, 0-2 not: reference greedy gives
        # {0,1}, {2} (1 can't extend the link) — not full transitive CC
        e0, e1, e2 = [1.0, 0.0], [0.9, 0.44], [0.62, 0.79]
        clusters = greedy_cluster([e0, e1, e2], threshold=0.85)
        assert clusters == [[0, 1], [2]]

    def test_parse_claims_validation(self):
        ctxs = [
            SourceContext(1, "doc1", 1.0, "text1", final_score=0.8),
            SourceContext(2, "doc2", 1.0, "text2", final_score=0.4),
        ]
        report = '{"answer": [{"statement": "s1", "sources": [1, 2, 99]},' \
                 '{"statement": "s2", "sources": []}]}'
        claims = parse_claims(report, ctxs)
        assert claims[0].source_indices == [1, 2]  # 99 filtered out
        assert abs(claims[0].confidence - 0.6) < 1e-9
        assert claims[1].confidence == 0.8 * 0.5  # uncited fallback

    def test_unbalanced_braces_rejected(self):
        assert parse_claims('{"answer": [{}', []) == []

    def test_no_grounded_answer(self):
        assert parse_claims("No grounded answer found", []) == []

    def test_end_to_end_stub(self):
        ctxs = [
            SourceContext(1, "d1", 1.0, "alpha", 0.9, hash_embed("alpha")),
            SourceContext(2, "d2", 1.0, "alpha", 0.8, hash_embed("alpha")),
            SourceContext(3, "d3", 1.0, "different entirely", 0.7, hash_embed("zzz qqq")),
        ]
        claims = synthesize("q", ctxs)
        # identical embeddings cluster; claim 1 cites both sources
        assert claims[0].source_indices == [1, 2]
        assert claims[1].source_indices == [3]


class TestEmbed:
    def test_deterministic_and_normalized(self):
        a, b = hash_embed("hello world"), hash_embed("hello world")
        assert a == b
        assert abs(sum(x * x for x in a) - 1.0) < 1e-6

    def test_dimension_guardrail(self):
        check_dimension(None, 64)
        check_dimension(64, 64)
        try:
            check_dimension(64, 128)
            assert False
        except ValueError:
            pass
