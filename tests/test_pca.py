"""PCA operator vs exact single-machine numpy — the honesty check for the
rows-only catalog entry embedding_pca_project."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def fixture_pca(spark):
    from ai_vector_database_converstion_from_pdf_spark.operators.pca import (
        pca_fit,
        pca_project,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    model = pca_fit(emb, k=4)
    proj = {
        r["id"]: np.asarray(r["proj"])
        for r in pca_project(emb, model).collect()
    }
    X = np.asarray(
        [
            np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.orderBy("vec_id").collect()
        ]
    )
    ids = [r["vec_id"] for r in emb.orderBy("vec_id").collect()]
    return model, proj, X, ids


class TestPca:
    def test_matches_numpy_exact(self, fixture_pca):
        model, proj, X, ids = fixture_pca
        mean = X.mean(axis=0)
        cov = (X - mean).T @ (X - mean) / len(X)
        evals, evecs = np.linalg.eigh(cov)
        order = np.argsort(evals)[::-1][:4]
        assert np.allclose(model.mean, mean, atol=1e-9)
        assert np.allclose(model.variances, evals[order], atol=1e-9)
        # subspace equality: |cos| of each component with numpy's is 1
        for i, col in enumerate(order):
            c = abs(float(model.components[i] @ evecs[:, col]))
            assert c == pytest.approx(1.0, abs=1e-8)

    def test_projection_values(self, fixture_pca):
        model, proj, X, ids = fixture_pca
        mean = X.mean(axis=0)
        want = (X - mean) @ model.components.T
        got = np.asarray([proj[i] for i in ids])
        assert np.allclose(got, want, atol=1e-6)

    def test_variance_ordering_and_capture(self, fixture_pca):
        model, _, X, _ = fixture_pca
        v = model.variances
        assert all(v[i] >= v[i + 1] - 1e-12 for i in range(len(v) - 1))
        total = np.trace((X - X.mean(0)).T @ (X - X.mean(0)) / len(X))
        assert 0 < v.sum() <= total + 1e-9

    def test_reconstruction_error_drops_with_k(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.pca import (
            pca_fit,
        )

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        X = np.asarray(
            [np.asarray(r["embedding"], np.float64) for r in emb.collect()]
        )
        errs = []
        for k in (1, 4, 16):
            m = pca_fit(emb, k=k)
            P = (X - m.mean) @ m.components.T
            R = P @ m.components + m.mean
            errs.append(float(((X - R) ** 2).sum()))
        assert errs[0] > errs[1] > errs[2]

    def test_layout_invariance_within_tolerance(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.pca import (
            pca_fit,
        )

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        a = pca_fit(emb.coalesce(1), k=2)
        b = pca_fit(emb.repartition(16), k=2)
        assert np.allclose(a.variances, b.variances, atol=1e-9)
        for i in range(2):
            assert abs(float(a.components[i] @ b.components[i])) == pytest.approx(
                1.0, abs=1e-8
            )

    def test_single_vector_raises(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.pca import (
            pca_fit,
        )

        emb = spark.createDataFrame(
            [(0, [1.0, 2.0])], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError):
            pca_fit(emb, k=1)
