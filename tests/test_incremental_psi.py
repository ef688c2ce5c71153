"""Incremental batch-vs-corpus dedup and source PSI drift."""

from pyspark.sql import Row, functions as F

from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
    incremental_lsh_pairs,
    minhash_lsh_pairs,
)
from ai_vector_database_converstion_from_pdf_spark.operators.quality import source_psi

from .conftest import SF_SMOKE


class TestIncrementalLsh:
    def test_batch_dup_of_corpus_found(self, spark):
        corpus = spark.createDataFrame(
            [
                Row(doc_id=1, text="alpha beta gamma delta epsilon zeta eta theta iota kappa"),
                Row(doc_id=2, text="one two three four five six seven eight nine ten"),
            ]
        )
        batch = spark.createDataFrame(
            [
                # identical shingle set -> guaranteed band collision
                Row(doc_id=100, text="alpha beta gamma delta epsilon zeta eta theta iota kappa"),
                Row(doc_id=101, text="totally unrelated content about the weather and rain today"),
            ]
        )
        res = incremental_lsh_pairs(corpus, batch, threshold=0.5).collect()
        assert {(r.new_id, r.corpus_id) for r in res} == {(100, 1)}
        assert res[0].jaccard == 1.0

    def test_no_batch_internal_or_corpus_internal_pairs(self, spark):
        dup = "same words repeated here exactly for the dedup check to find"
        corpus = spark.createDataFrame(
            [Row(doc_id=1, text=dup), Row(doc_id=2, text=dup)]
        )
        batch = spark.createDataFrame(
            [Row(doc_id=100, text="fresh text one two three four five six"),
             Row(doc_id=101, text="fresh text one two three four five six")]
        )
        res = incremental_lsh_pairs(corpus, batch, threshold=0.5).collect()
        # corpus 1~2 and batch 100~101 are dup pairs but NOT cross pairs
        assert res == []

    def test_matches_full_lsh_cross_restriction(self, spark):
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        batch = docs.filter(F.col("doc_id") % 5 == 0)
        corpus = docs.filter(F.col("doc_id") % 5 != 0)
        inc = sorted(
            (r.new_id, r.corpus_id, r.jaccard)
            for r in incremental_lsh_pairs(corpus, batch, 0.7).collect()
        )
        full = minhash_lsh_pairs(docs, threshold=0.7).collect()
        cross = sorted(
            (b, c, r.jaccard)
            for r in full
            for b, c in [
                (r.id_a, r.id_b) if r.id_a % 5 == 0 else (r.id_b, r.id_a)
            ]
            if b % 5 == 0 and c % 5 != 0
        )
        assert inc == cross


class TestSourcePsi:
    def test_identical_distributions_near_zero(self, spark):
        rows = []
        for s in ("a", "b"):
            for i in range(100):
                rows.append(Row(doc_id=len(rows), source=s, n_chars=100 + (i % 10) * 50))
        docs = spark.createDataFrame(rows)
        res = {r.source: r.psi for r in source_psi(docs).collect()}
        assert abs(res["a"]) < 0.01 and abs(res["b"]) < 0.01

    def test_shifted_source_flags(self, spark):
        rows = []
        for i in range(200):
            rows.append(Row(doc_id=i, source="stable", n_chars=100 + (i % 10) * 20))
        for i in range(50):
            rows.append(Row(doc_id=1000 + i, source="shifted", n_chars=900))
        docs = spark.createDataFrame(rows)
        res = {r.source: r for r in source_psi(docs).collect()}
        assert res["shifted"].psi > 0.25
        assert res["shifted"].n_docs == 50

    def test_layout_invariance(self, spark):
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        a = sorted(map(tuple, source_psi(docs).collect()))
        b = sorted(map(tuple, source_psi(docs.repartition(9)).collect()))
        assert a == b and len(a) > 0
