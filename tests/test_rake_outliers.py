"""RAKE keyword extraction and embedding centroid outliers."""

import pytest
from pyspark.sql import Row

from ai_vector_database_converstion_from_pdf_spark.operators.rake import (
    candidate_phrases,
    rake_keywords,
)
from ai_vector_database_converstion_from_pdf_spark.operators.similarity import (
    centroid_outliers,
)


class TestRake:
    def test_hand_computed(self, spark):
        # stopwords: the and of to is a in that
        # doc: "deep learning of deep models in the deep learning era"
        # phrases: [deep learning], [deep models], [deep learning era]
        docs = spark.createDataFrame(
            [Row(doc_id=1, text="deep learning of deep models in the deep learning era")]
        )
        ph = sorted(
            (r.phrase, r.plen) for r in candidate_phrases(docs).collect()
        )
        assert ph == [("deep learning", 2), ("deep learning era", 3), ("deep models", 2)]
        # word stats: deep: freq 3, deg 2+3+2=7 -> 7/3
        #             learning: freq 2, deg 2+3=5 -> 5/2
        #             era: freq 1, deg 3 -> 3
        #             models: freq 1, deg 2 -> 2
        res = {r.phrase: r for r in rake_keywords(docs, top_k=10).collect()}
        assert res["deep learning era"].score == pytest.approx(
            round(7 / 3, 6) + 2.5 + 3.0, abs=2e-6
        )
        assert res["deep learning"].score == pytest.approx(
            round(7 / 3, 6) + 2.5, abs=2e-6
        )
        assert res["deep models"].score == pytest.approx(
            round(7 / 3, 6) + 2.0, abs=2e-6
        )
        # "deep learning" stands alone once; its other occurrence is
        # inside the distinct phrase "deep learning era"
        assert res["deep learning"].n_occurrences == 1
        # ranking: era-phrase > learning-phrase > models-phrase
        ordered = [
            r.phrase
            for r in sorted(
                res.values(), key=lambda r: (-r.score, r.phrase)
            )
        ]
        assert ordered[0] == "deep learning era"

    def test_stopword_runs_split_phrases(self, spark):
        docs = spark.createDataFrame(
            [Row(doc_id=1, text="alpha beta the gamma and delta epsilon")]
        )
        ph = {r.phrase for r in candidate_phrases(docs).collect()}
        assert ph == {"alpha beta", "gamma", "delta epsilon"}

    def test_long_runs_dropped(self, spark):
        docs = spark.createDataFrame(
            [Row(doc_id=1, text="one two three four five the six seven")]
        )
        ph = {r.phrase for r in candidate_phrases(docs, max_len=4).collect()}
        assert ph == {"six seven"}  # 5-token run dropped

    def test_layout_invariance(self, spark):
        from .conftest import SF_SMOKE

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        a = [(r.phrase, r.n_occurrences, r.score) for r in rake_keywords(docs).collect()]
        b = [
            (r.phrase, r.n_occurrences, r.score)
            for r in rake_keywords(docs.repartition(7)).collect()
        ]
        assert a == b and len(a) > 0


class TestCentroidOutliers:
    def test_planted_outlier_flagged(self, spark):
        # tight cluster around e1 plus one vector pointing away
        base = [1.0, 0.0, 0.0, 0.0]
        rows = []
        for i in range(8):
            v = list(base)
            v[1] = 0.01 * i  # tiny wiggle, cos ~1
            rows.append(Row(vec_id=i, embedding=v))
        rows.append(Row(vec_id=99, embedding=[0.3, 0.95, 0.0, 0.0]))
        emb = spark.createDataFrame(rows)
        cents = [(0, base)]
        res = {r.vec_id: r for r in centroid_outliers(emb, cents, 2.0).collect()}
        assert res[99].is_outlier
        assert not any(res[i].is_outlier for i in range(8))
        assert res[99].z < -2

    def test_singleton_cluster_z_zero(self, spark):
        emb = spark.createDataFrame(
            [
                Row(vec_id=0, embedding=[1.0, 0.0]),
                Row(vec_id=1, embedding=[0.0, 1.0]),
            ]
        )
        cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
        res = {r.vec_id: r for r in centroid_outliers(emb, cents).collect()}
        assert res[0].z == 0.0 and res[1].z == 0.0
        assert not res[0].is_outlier and not res[1].is_outlier

    def test_layout_invariance(self, spark):
        from .conftest import SF_SMOKE

        from ai_vector_database_converstion_from_pdf_spark.operators.similarity import (
            sample_centroids,
        )

        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        cents = sample_centroids(emb, 5)
        a = sorted(
            (r.vec_id, r.centroid_id, r.z, r.is_outlier)
            for r in centroid_outliers(emb, cents).collect()
        )
        b = sorted(
            (r.vec_id, r.centroid_id, r.z, r.is_outlier)
            for r in centroid_outliers(emb.repartition(11), cents).collect()
        )
        assert a == b and len(a) > 0
