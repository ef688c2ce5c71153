"""Degenerate-input robustness: empty corpora, single rows, k > N —
the places distributed plans typically break first."""

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def _empty_emb(spark):
    return spark.createDataFrame([], "vec_id long, embedding array<float>")


class TestEmptyCorpus:
    def test_hybrid_on_empty_corpus(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.plans.hybrid import hybrid_search

        out = hybrid_search(
            _empty_docs(spark), _empty_emb(spark), "any query", [0.0] * 4, k=5
        )
        assert out.count() == 0

    def test_dedup_on_empty_and_single(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
            exact_dedup,
            minhash_lsh_pairs,
            ngram_jaccard_pairs,
            simhash_pairs,
        )

        empty = _empty_docs(spark)
        assert exact_dedup(empty).count() == 0
        assert ngram_jaccard_pairs(empty, 0.5).count() == 0
        one = spark.createDataFrame([(1, "only one document here")], "doc_id long, text string")
        assert exact_dedup(one).count() == 1
        assert minhash_lsh_pairs(one, 0.5).count() == 0  # no pairs
        assert simhash_pairs(one).count() == 0

    def test_short_text_shingles_empty(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.dedup import word_shingles

        df = spark.createDataFrame([(1, "two words"), (2, "")], "doc_id long, text string")
        # < n tokens → no shingles, no descending-sequence blowup
        assert word_shingles(df, n=3).count() == 0


class TestKBeyondCorpus:
    def test_topk_larger_than_corpus(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.semantic import semantic_topk

        emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").limit(3)
        q = [1.0] * 64
        out = semantic_topk(emb, q, k=50).collect()
        assert len(out) == 3  # all rows, no error

    def test_rerank_fewer_candidates_than_topk(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.rerank import rerank_topk

        cands = spark.createDataFrame(
            [(1, "alpha text", 0.9), (2, "beta text", 0.8)],
            "id long, text string, score double",
        )
        out = rerank_topk(cands, "alpha", topk=5, n_in=10).collect()
        assert len(out) == 2


class TestNullSafety:
    def test_text_profile_handles_empty_strings(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.textstats import text_profile

        df = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, "normal text here")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in text_profile(df).collect()}
        assert rows[1]["ws_tokens"] == 0
        assert rows[1]["punct_ratio"] == 0.0
        assert rows[2]["mean_word_len"] == 0.0
        assert rows[3]["lang_pred"] in ("en", "und")

    def test_cosine_zero_vector(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.functions.vector import cosine

        df = spark.createDataFrame(
            [([0.0, 0.0], [1.0, 0.0])], "a array<double>, b array<double>"
        )
        assert df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()[0]["c"] == 0.0


class TestNewOpEdgeCases:
    def test_tfidf_and_surprisal_empty_and_blank_docs(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.textstats import (
            unigram_surprisal,
        )
        from ai_vector_database_converstion_from_pdf_spark.operators.tfidf import (
            tfidf_top_terms,
        )

        empty = spark.createDataFrame([], "doc_id long, text string")
        assert tfidf_top_terms(empty).count() == 0
        assert unigram_surprisal(empty).count() == 0
        # blank/punctuation-only docs drop out (no tokens); real doc scores
        mixed = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, "?!"), (4, "real words here")],
            "doc_id long, text string",
        )
        assert {r["doc_id"] for r in unigram_surprisal(mixed).collect()} == {4}
        assert {r["doc_id"] for r in tfidf_top_terms(mixed).collect()} == {4}

    def test_pack_empty_and_oversized(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.packing import (
            pack_next_fit,
        )

        empty = spark.createDataFrame([], "doc_id long, text string")
        assert pack_next_fit(empty).count() == 0
        # a doc bigger than capacity still gets exactly one pack
        one = spark.createDataFrame(
            [(5, " ".join(["tok"] * 500))], "doc_id long, text string"
        )
        rows = pack_next_fit(one, capacity=128).collect()
        assert len(rows) == 1 and rows[0]["pack_id"] == 0 and rows[0]["n_tokens"] == 500

    def test_pagerank_empty_edges(self, spark):
        import pytest

        from ai_vector_database_converstion_from_pdf_spark.operators.graph import (
            pagerank,
        )

        empty = spark.createDataFrame([], "id_a long, id_b long")
        with pytest.raises(Exception):
            pagerank(empty)  # no nodes -> no distribution to compute

    def test_quality_report_on_empty_tables(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.quality import (
            quality_report,
        )

        orders = spark.createDataFrame([], "o_orderkey long, o_orderstatus string")
        lineitem = spark.createDataFrame([], "l_orderkey long, l_discount double")
        documents = spark.createDataFrame([], "doc_id long, text string")
        events = spark.createDataFrame([], "event_id long, ts timestamp")
        got = {
            r["check"]: r["n_violations"]
            for r in quality_report(spark, orders, lineitem, documents, events).collect()
        }
        # empty tables are healthy: sum() over empty input is NULL and
        # must surface as 0 for EVERY check, never None
        assert all(v == 0 for v in got.values()), got
        assert len(got) == 6
