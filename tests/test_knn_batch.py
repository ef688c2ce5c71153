"""Blocked batch k-NN retrieval (r13, VERDICT r12 #4): knn_join gains
an eval-scale plan — query blocks broadcast into BLAS GEMMs over the
corpus scan with per-batch top-k candidate emission — behind a
broadcast-budget auto flip. Contract: per-query output IDENTICAL to
the BNLJ window plan (same rounding, same id tiebreak)."""

from __future__ import annotations

import logging
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from ai_vector_database_converstion_from_pdf_spark.operators import (  # noqa: E402
    semantic,
)

SF = "/root/testdata/sf0.01"
LOGGER = "ai_vector_database_converstion_from_pdf_spark.operators.semantic"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").localCheckpoint(
        eager=True
    )


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 30).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    ).localCheckpoint(eager=True)


def _rows(df):
    return sorted(
        (int(r["q_id"]), int(r["knn_rank"]), int(r["vec_id"]), float(r["score"]))
        for r in df.collect()
    )


def test_blocked_matches_bnlj(emb, queries):
    bnlj = semantic.knn_join(queries, emb, k=5, method="bnlj")
    # tiny block size forces MULTIPLE query blocks through the driver
    # stream — the union-over-blocks coverage is what's under test
    blocked = semantic.knn_join(
        queries, emb, k=5, method="blocked", block_bytes=8 * 64 * 10
    )
    a, b = _rows(bnlj), _rows(blocked)
    assert len(a) == 30 * 5
    assert a == b


def test_auto_flips_to_blocked_and_logs(emb, queries, caplog):
    with caplog.at_level(logging.WARNING, logger=LOGGER):
        out = semantic.knn_join(
            queries, emb, k=5, method="auto", broadcast_bytes=100
        )
        got = _rows(out)
    assert any(
        "switching to the blocked" in r.getMessage() for r in caplog.records
    )
    assert got == _rows(semantic.knn_join(queries, emb, k=5, method="bnlj"))


def test_auto_small_stays_bnlj_without_probe_jobs(emb, queries, caplog):
    with caplog.at_level(logging.WARNING, logger=LOGGER):
        out = semantic.knn_join(queries, emb, k=5, n_queries=30)
        assert out.count() == 150
    assert not any(
        "switching to the blocked" in r.getMessage() for r in caplog.records
    )


def test_blocked_handles_ties_and_self_match(emb, queries):
    """knn_rank 1 is the self-match (cos 1.0) for every query in both
    plans — the tiebreak seam where per-batch selection could diverge."""
    blocked = semantic.knn_join(
        queries, emb, k=3, method="blocked", block_bytes=8 * 64 * 7
    )
    firsts = {
        int(r["q_id"]): int(r["vec_id"])
        for r in blocked.filter(F.col("knn_rank") == 1).collect()
    }
    assert firsts == {q: q for q in range(30)}


def test_blocked_empty_queries(emb, spark):
    empty = spark.createDataFrame([], "q_id long, q_vec array<float>")
    out = semantic.knn_join(empty, emb, k=5, method="blocked")
    assert out.count() == 0
    assert out.columns == ["q_id", "vec_id", "score", "knn_rank"]


def test_blocked_plan_shape(emb, queries):
    """The blocked plan must be GEMM scans + one final per-query window:
    MapInPandas present, and never a sort-merge join or cartesian
    (the shapes the BNLJ path would degrade to if the broadcast hint
    were lost)."""
    blocked = semantic.knn_join(
        queries, emb, k=5, method="blocked", block_bytes=8 * 64 * 10
    )
    plan = blocked._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
