"""ANN paths are approximate — the honest contract is recall against the
exact brute-force baseline, not equality. Exact kNN itself is oracle-
checked in test_catalog_oracle."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE

DIM = 64


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").cache()


def _exact_topk_ids(emb, qvec, k):
    from ai_vector_database_converstion_from_pdf_spark.operators.semantic import semantic_topk

    return [r["vec_id"] for r in semantic_topk(emb, qvec, k).collect()]


def _qvec(emb, vid):
    return list(emb.filter(F.col("vec_id") == vid).collect()[0]["embedding"])


def test_lsh_recall(spark, emb):
    from ai_vector_database_converstion_from_pdf_spark.operators.similarity import (
        ann_lsh_topk,
        rp_lsh_buckets,
    )

    # Fixture neighbors are weakly similar (cos ~0.2-0.5), so the right
    # LSH regime is short signatures x many tables: per-plane collision
    # p = 1 - theta/pi ~ 0.6 here, so 4 planes x 12 tables gives ~0.7-0.85
    # table-level recall for true top-10 neighbors.
    buckets = rp_lsh_buckets(emb, DIM, n_planes=4, n_tables=12).cache()
    recalls = []
    for vid in (0, 7, 42):
        q = _qvec(emb, vid)
        exact = set(_exact_topk_ids(emb, q, 10))
        approx = set(
            r["vec_id"]
            for r in ann_lsh_topk(emb, q, 10, DIM, 4, 12, buckets=buckets).collect()
        )
        recalls.append(len(exact & approx) / 10)
    assert sum(recalls) / len(recalls) >= 0.4, recalls
    # the query's own vector must always be found (hash collision with self)
    q0 = _qvec(emb, 0)
    top = ann_lsh_topk(emb, q0, 1, DIM, 4, 12).collect()
    assert top[0]["vec_id"] == 0 and top[0]["score"] == 1.0


def test_lsh_candidates_shrink(spark, emb):
    """LSH must actually prune: candidate set well under the corpus."""
    from ai_vector_database_converstion_from_pdf_spark.operators.similarity import (
        _planes,
        rp_lsh_buckets,
    )

    buckets = rp_lsh_buckets(emb, DIM, n_planes=8, n_tables=4)
    sizes = buckets.groupBy("table", "bucket").count().agg(F.max("count")).collect()[0][0]
    total = emb.count()
    assert sizes < total * 0.25, f"largest bucket {sizes} of {total}"


def test_ivf_recall(spark, emb):
    from ai_vector_database_converstion_from_pdf_spark.operators.similarity import (
        ivf_assign,
        ivf_topk,
        kmeans_centroids,
        sample_centroids,
    )

    # 10 centroids = the fixture's planted label count
    cents = kmeans_centroids(emb, 10)
    assert len(cents) == 10
    assign = ivf_assign(emb, cents).cache()
    # every row assigned exactly once
    assert assign.count() == emb.count()
    q = _qvec(emb, 3)
    exact = set(_exact_topk_ids(emb, q, 10))
    # probing all cells must equal exact search
    full = [r["vec_id"] for r in ivf_topk(emb, q, 10, cents, assign, n_probe=10).collect()]
    assert set(full) == exact

    # recall@10 averaged over queries (everything here is seeded and the
    # fixture fixed, so these are deterministic): the k-means cells must
    # beat the degenerate first-n-by-id pick and clear the floor
    naive = sample_centroids(emb, 10)
    nassign = ivf_assign(emb, naive).cache()

    def avg_recall(cs, asg):
        total = 0.0
        for qi in (3, 20, 77, 150, 333, 411):
            qv = _qvec(emb, qi)
            ex = set(_exact_topk_ids(emb, qv, 10))
            ap = set(
                r["vec_id"]
                for r in ivf_topk(emb, qv, 10, cs, asg, n_probe=3).collect()
            )
            total += len(ex & ap) / 10
        return total / 6

    km, nv = avg_recall(cents, assign), avg_recall(naive, nassign)
    assert km >= 0.5
    assert km >= nv


def test_ivf_auto_params_rule():
    from ai_vector_database_converstion_from_pdf_spark.operators.similarity import (
        ivf_auto_params,
    )

    # 2*sqrt(N) cells, 37.5% probed, clamps at both ends
    assert ivf_auto_params(500) == (45, 17)
    assert ivf_auto_params(4) == (8, 3)
    nc, npr = ivf_auto_params(100_000_000)
    assert nc == 4096 and npr == 1536
    assert ivf_auto_params(0) == (8, 3)
    # probe never exceeds the centroid count
    nc, npr = ivf_auto_params(16, probe_frac=2.0)
    assert npr <= nc


def test_ivf_auto_recall_floor(spark, emb):
    """The auto-sizing rule must clear recall@10 >= 0.8 averaged over
    queries on the near-uniform fixture — IVF's worst case (VERDICT r7
    #2: the fixed 16/4 config sat at 0.59). Seeded + deterministic."""
    from ai_vector_database_converstion_from_pdf_spark.operators.similarity import (
        ivf_assign,
        ivf_auto_params,
        ivf_topk,
        kmeans_centroids,
    )

    nc, n_probe = ivf_auto_params(emb.count())
    cents = kmeans_centroids(emb, nc)
    assign = ivf_assign(emb, cents).cache()
    total = 0.0
    qids = (3, 20, 77, 150, 333, 411)
    for qi in qids:
        qv = _qvec(emb, qi)
        ex = set(_exact_topk_ids(emb, qv, 10))
        ap = set(
            r["vec_id"]
            for r in ivf_topk(emb, qv, 10, cents, assign, n_probe=n_probe).collect()
        )
        total += len(ex & ap) / 10
    assert total / len(qids) >= 0.8, total / len(qids)


def test_kmeans_centroids_deterministic(spark, emb):
    from ai_vector_database_converstion_from_pdf_spark.operators.similarity import (
        kmeans_centroids,
    )

    a = kmeans_centroids(emb, 8)
    b = kmeans_centroids(emb, 8)
    assert a == b
    # unit-norm centroids (spherical k-means contract)
    import math

    for _cid, v in a:
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-9


def test_int8_rescore_recall_and_exact_scores(spark, emb):
    """Two-stage int8 shortlist + exact rescore: returned scores must be
    the exact cosine (stage 2 is exact), and recall vs brute force stays
    high — quantization error is ~1e-2, far below fixture score gaps."""
    from ai_vector_database_converstion_from_pdf_spark.operators.quantize import int8_topk_rescore
    from ai_vector_database_converstion_from_pdf_spark.operators.semantic import semantic_topk

    for vid in (0, 42):
        q = _qvec(emb, vid)
        exact = {r["vec_id"]: r["score"] for r in semantic_topk(emb, q, 10).collect()}
        two_stage = int8_topk_rescore(emb, q, k=10, shortlist=50).collect()
        got = {r["vec_id"]: r["score"] for r in two_stage}
        # scores of returned ids are the exact cosine, not the int8 one
        for rid, s in got.items():
            if rid in exact:
                assert s == exact[rid]
        assert len(set(exact) & set(got)) >= 9
        # the query's own vector is rank 1 with score 1.0
        assert two_stage[0]["vec_id"] == vid and two_stage[0]["score"] == 1.0


def test_int8_shortlist_is_take_ordered(spark, emb):
    """Stage 1 must compile to TakeOrderedAndProject (no full sort of the
    corpus) and stay UDF-free."""
    from ai_vector_database_converstion_from_pdf_spark.operators.quantize import int8_topk_rescore

    q = _qvec(emb, 0)
    plan = int8_topk_rescore(emb, q, k=10, shortlist=50)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pq_recall_and_roundtrip(spark, emb):
    """PQ/ADC recall vs brute force: the raw ADC shortlist is coarse on
    these weakly-clustered fixtures (>=0.4), the two-stage rescore is
    the production path (>=0.8). Self-query must rank its own vector
    first (its codes minimize the ADC distance to itself)."""
    from ai_vector_database_converstion_from_pdf_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_topk_rescore,
        pq_train,
    )

    books = pq_train(emb, dim=DIM, m=16, k=32)
    assert books.shape == (16, 32, 4)
    codes = pq_encode(emb, books).cache()
    # codes are within [0, k)
    import numpy as np

    sample = codes.limit(50).collect()
    arr = np.asarray([r["codes"] for r in sample])
    assert arr.shape[1] == 16 and arr.min() >= 0 and arr.max() < 32
    raw, staged = [], []
    for vid in (0, 7, 42):
        q = _qvec(emb, vid)
        exact = set(_exact_topk_ids(emb, q, 10))
        adc = {r["vec_id"] for r in pq_topk(codes, q, books, 10).collect()}
        two = {
            r["vec_id"]
            for r in pq_topk_rescore(codes, emb, q, books, 10).collect()
        }
        raw.append(len(exact & adc) / 10)
        staged.append(len(exact & two) / 10)
    assert sum(raw) / len(raw) >= 0.4, raw
    assert sum(staged) / len(staged) >= 0.8, staged
    top = pq_topk(codes, _qvec(emb, 0), books, 1).collect()
    assert top[0]["vec_id"] == 0
    # rescore returns EXACT cosine for the self row
    top2 = pq_topk_rescore(codes, emb, _qvec(emb, 0), books, 1).collect()
    assert top2[0]["vec_id"] == 0 and top2[0]["score"] == 1.0


def test_ivf_pq_composite_recall(spark, emb):
    """IVF-PQ composite (probe-filter + ADC shortlist + exact rescore):
    recall vs brute force must stay high, scores must be EXACT cosines,
    and the probe must appear in the plan as a filter, not a join."""
    from ai_vector_database_converstion_from_pdf_spark.operators.similarity import (
        ivf_pq_index,
        ivf_pq_topk,
        kmeans_centroids,
        pq_train,
    )

    cents = kmeans_centroids(emb, 16)
    books = pq_train(emb, dim=DIM, m=16, k=32)
    idx = ivf_pq_index(emb, cents, books).cache()
    hits = 0
    K = 10
    for vid in (0, 7, 42, 99, 123):
        qv = _qvec(emb, vid)
        exact = set(_exact_topk_ids(emb, qv, K))
        got = ivf_pq_topk(
            idx, emb, qv, books, cents, k=K, n_probe=6, shortlist=100
        ).collect()
        hits += len(exact & {r["vec_id"] for r in got})
        # exact-rescore contract: returned scores equal true cosines
        from ai_vector_database_converstion_from_pdf_spark.operators.semantic import (
            semantic_topk,
        )

        truth = {
            r["vec_id"]: r["score"] for r in semantic_topk(emb, qv, 200).collect()
        }
        assert all(
            abs(r["score"] - truth[r["vec_id"]]) < 1e-9
            for r in got
            if r["vec_id"] in truth
        )
    # probing 6/16 cells: some true neighbors live in unprobed cells by
    # design (same contract as test_ivf_recall's 0.5 floor at 3/10)
    assert hits / (5 * K) >= 0.7
    idx.unpersist()


def test_pq_survives_empty_partitions(spark, emb):
    """Empty Arrow batches must not crash the mapInPandas generators
    (ADVICE r2 low #3: np.asarray([]) is 1-D and norm(axis=1) raises)."""
    from ai_vector_database_converstion_from_pdf_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train,
    )

    books = pq_train(emb, dim=DIM, m=16, k=32)
    sparse = emb.limit(3).repartition(16)  # 13+ empty partitions
    codes = pq_encode(sparse, books)
    assert codes.count() == 3
    assert pq_topk(codes, _qvec(emb, 0), books, 2).count() == 2


def test_pq_deterministic(spark, emb):
    import numpy as np

    from ai_vector_database_converstion_from_pdf_spark.operators.similarity import (
        pq_train,
    )

    a = pq_train(emb, dim=DIM, m=16, k=32)
    b = pq_train(emb, dim=DIM, m=16, k=32)
    assert np.array_equal(a, b)


def test_pq_adc_approximates_cosine(spark, emb):
    """adc_dist must correlate with 2-2*cos: check the monotone
    relationship on the true top-20 (Spearman-ish sign test)."""
    from ai_vector_database_converstion_from_pdf_spark.operators.semantic import (
        semantic_topk,
    )
    from ai_vector_database_converstion_from_pdf_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train,
    )

    q = _qvec(emb, 3)
    books = pq_train(emb, dim=DIM, m=16, k=32)
    codes = pq_encode(emb, books)
    adc = {r["vec_id"]: r["adc_dist"] for r in pq_topk(codes, q, books, 2000).collect()}
    exact = {r["vec_id"]: r["score"] for r in semantic_topk(emb, q, 20).collect()}
    pairs = [(exact[v], adc[v]) for v in exact if v in adc]
    import numpy as np

    cos_v = np.asarray([p[0] for p in pairs])
    adc_v = np.asarray([p[1] for p in pairs])
    # negative correlation: higher cosine -> smaller ADC distance
    assert np.corrcoef(cos_v, adc_v)[0, 1] < -0.5
