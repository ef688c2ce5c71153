"""ann_topk(method="auto") — the unified ANN family selector (r13,
VERDICT r12 #3).

Floors: auto must be within ε of the BEST fixed family on BOTH
structure shapes (the selector's whole contract), the probe must
classify both generator shapes correctly, and the selection must be
logged with its probe evidence. Shapes come from the same generators
the stress tiers use (tools.make_stress_fixture._clustered_vec and the
decorrelated-replica uniform shape from test_ann_clustered).
"""

from __future__ import annotations

import logging
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from tools.make_stress_fixture import _clustered_vec  # noqa: E402

from ai_vector_database_converstion_from_pdf_spark.operators import (  # noqa: E402
    quantize,
    semantic,
    similarity,
)

SF = "/root/testdata/sf0.01"
K = 10
N_QUERIES = 10
LOGGER = "ai_vector_database_converstion_from_pdf_spark.operators.similarity"


def _clustered(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    reps = spark.range(2).select(F.col("id").alias("_rep"))
    return (
        emb.crossJoin(F.broadcast(reps))
        .withColumn("embedding", _clustered_vec(F, 16, 0.5))
        .select(
            (F.col("vec_id") + F.col("_rep") * 10_000_000).alias("vec_id"),
            "embedding",
        )
        .localCheckpoint(eager=True)
    )


def _uniform(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    reps = spark.range(2).select(F.col("id").alias("_rep"))
    return (
        emb.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("_rep") * 10_000_000).alias("vec_id"),
            F.when(F.col("_rep") == 0, F.col("embedding"))
            .otherwise(F.reverse(F.col("embedding")))
            .alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )


@pytest.fixture(scope="module")
def shapes(spark):
    return _clustered(spark), _uniform(spark)


def _recall(emb, method):
    qrows = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    assert len(qrows) == N_QUERIES
    total = 0.0
    for r in qrows:
        qv = list(r["embedding"])
        exact = {
            int(x[0]) for x in semantic.semantic_topk(emb, qv, k=K).collect()
        }
        got = {int(x[0]) for x in method(emb, qv).collect()}
        total += len(exact & got) / K
    return total / len(qrows)


def test_probe_classifies_both_shapes(shapes):
    clu, uni = shapes
    p_clu = similarity.probe_corpus_structure(clu)
    p_uni = similarity.probe_corpus_structure(uni)
    assert p_clu["clustered"] is True, p_clu
    assert p_uni["clustered"] is False, p_uni
    # the measured separation is wide; pin the gap so drift in the
    # sampling or the generator shows up as a test failure, not a
    # silent mis-selection
    assert p_clu["mean_nn_cos"] >= 0.75, p_clu
    assert p_uni["mean_nn_cos"] <= 0.55, p_uni


def test_auto_selects_and_logs(shapes, caplog):
    clu, uni = shapes
    with caplog.at_level(logging.WARNING, logger=LOGGER):
        idx_clu = similarity.ann_auto_index(clu)
        idx_uni = similarity.ann_auto_index(uni)
    assert idx_clu["family"] == "ivf-auto"
    assert idx_uni["family"] == "int8-auto"
    msgs = [r.getMessage() for r in caplog.records]
    assert any("CLUSTERED" in m and "mean sampled NN-cos" in m for m in msgs)
    assert any("UNIFORM" in m and "mean sampled NN-cos" in m for m in msgs)


@pytest.mark.slow  # recall-floor sweep on generated fixtures (VERDICT r13 #8)
def test_auto_matches_best_fixed_family_clustered(shapes):
    """auto ≥ best fixed family − ε on the clustered generator. The
    measured best there is IVF-auto (recall 1.0 at sf0.1 scale)."""
    clu, _ = shapes
    idx = similarity.ann_auto_index(clu)
    auto = _recall(clu, lambda e, qv: similarity.ann_topk(e, qv, k=K, index=idx))
    nc, n_probe = similarity.ivf_auto_params(clu.count())
    cents = similarity.kmeans_centroids(clu, nc)
    assign = similarity.ivf_assign(clu, cents)
    fixed = _recall(
        clu,
        lambda e, qv: similarity.ivf_topk(
            e, qv, k=K, centroids=cents, assignments=assign, n_probe=n_probe
        ),
    )
    assert auto >= fixed - 0.05, (auto, fixed)
    assert auto >= 0.90, auto


@pytest.mark.slow  # recall-floor sweep on generated fixtures (VERDICT r13 #8)
def test_auto_matches_best_fixed_family_uniform(shapes):
    """auto ≥ best fixed family − ε on the uniform generator. The
    measured best there is int8 auto-shortlist (recall 1.0 at two
    scales)."""
    _, uni = shapes
    idx = similarity.ann_auto_index(uni)
    auto = _recall(uni, lambda e, qv: similarity.ann_topk(e, qv, k=K, index=idx))
    fixed = _recall(
        uni,
        lambda e, qv: quantize.int8_topk_rescore(e, qv, k=K, shortlist="auto"),
    )
    assert auto >= fixed - 0.05, (auto, fixed)
    assert auto >= 0.95, auto


def test_auto_output_contract(shapes):
    """(vec_id, score) with exact cosine scores, (score desc, id asc),
    same schema from BOTH families — callers must not care which
    family the probe picked."""
    clu, uni = shapes
    for emb in shapes:
        row = emb.filter(F.col("vec_id") == 0).first()
        out = similarity.ann_topk(emb, list(row["embedding"]), k=K)
        assert out.columns == ["vec_id", "score"]
        rows = out.collect()
        assert len(rows) == K
        scores = [float(r["score"]) for r in rows]
        assert scores == sorted(scores, reverse=True)
        # self-match ranks first with cosine 1.0 in every family
        assert int(rows[0]["vec_id"]) == 0
        assert scores[0] == pytest.approx(1.0, abs=1e-6)
