"""Approximate-dispatch instrumentation (r13, VERDICT r12 #1/#2).

Two new behaviors on the sub-quadratic near-dup paths:

1. **Saturated-output gate**: before any pair enumeration runs, a
   seeded m×N exact sample estimates the total output; when it exceeds
   `expected_pairs_budget` the call REFUSES with a semdedup_prune
   redirect (pair enumeration is Θ(N²/k) in its own output on
   saturated corpora) unless `allow_dense_output=True`.
2. **Runtime recall estimate**: the same sample is checked for
   coverage by the dispatched candidate structure (shared probed cell
   for the cluster path, shared (table, bucket) for rp-lsh) and the
   estimate is logged at dispatch time — the wedge-cap idiom
   ("quantify the degradation, say it in the log") generalized to the
   embedding side.

The fixtures reuse the exact clustered generator the stress tiers use
(tools.make_stress_fixture._clustered_vec), so the pinned bands match
the measured BASELINE.md shapes.
"""

from __future__ import annotations

import logging
import re
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from tools.make_stress_fixture import _clustered_vec  # noqa: E402

from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (  # noqa: E402
    _cluster_near_dup_pairs,
    _lsh_near_dup_pairs,
    _sample_exact_neighbors,
    embedding_near_dup_pairs,
)

SF = "/root/testdata/sf0.01"
LOGGER = "ai_vector_database_converstion_from_pdf_spark.operators.dedup"


def _clustered(spark, n_centers, spread, reps=2):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    r = spark.range(reps).select(F.col("id").alias("_rep"))
    return (
        emb.crossJoin(F.broadcast(r))
        .withColumn("embedding", _clustered_vec(F, n_centers, spread))
        .select(
            (F.col("vec_id") + F.col("_rep") * 10_000_000).alias("vec_id"),
            "embedding",
        )
        .localCheckpoint(eager=True)
    )


@pytest.fixture(scope="module")
def clustered(spark):
    # 1000 vectors in 16 planted clusters — the test_ann_clustered shape
    return _clustered(spark, n_centers=16, spread=0.5)


@pytest.fixture(scope="module")
def saturated(spark):
    # 4 tight clusters (spread 0.05): essentially EVERY within-cluster
    # pair is a near-dup at τ=0.8 → expected output ≈ N²/8 ≈ 125·N,
    # the miniature of the 200k/636M-pair boundary fixture
    return _clustered(spark, n_centers=4, spread=0.05)


def _logged_estimate(caplog, label):
    for r in caplog.records:
        if label in r.getMessage() and "estimated candidate recall" in r.getMessage():
            m = re.search(r"recall\s+≈\s+([0-9.]+)", r.getMessage())
            if m:
                return float(m.group(1))
    return None


def test_saturated_gate_refuses_with_semdedup_redirect(saturated):
    with pytest.raises(ValueError) as ei:
        _cluster_near_dup_pairs(
            saturated, 0.8, "vec_id", "embedding",
            n_clusters=8, flop_budget=1e9,
            expected_pairs_budget=5_000,
        ).count()
    msg = str(ei.value)
    assert "semdedup_prune" in msg
    assert "expected output" in msg


def test_saturated_gate_allow_dense_output_runs(saturated, caplog):
    with caplog.at_level(logging.WARNING, logger=LOGGER):
        got = _cluster_near_dup_pairs(
            saturated, 0.8, "vec_id", "embedding",
            n_clusters=8, flop_budget=1e9,
            expected_pairs_budget=5_000, allow_dense_output=True,
        )
        n = got.count()
    assert n > 5_000  # genuinely dense — the gate was right to fire
    assert any(
        "allow_dense_output=True" in r.getMessage() for r in caplog.records
    )


def test_auto_budget_clears_legitimate_density(clustered, caplog):
    """The 'auto' budget (100·N) must NOT refuse the legitimate
    clustered shape (~30·N pairs at τ0.8 / 16 clusters — the analog of
    the mixed-100x tier's 57·N output)."""
    with caplog.at_level(logging.WARNING, logger=LOGGER):
        got = _cluster_near_dup_pairs(
            clustered, 0.8, "vec_id", "embedding",
            n_clusters=None, flop_budget=1e9,
        )
        assert got.count() > 0


def test_cluster_recall_estimate_matches_measured(clustered, caplog):
    """The logged estimate must track the TRUE pair recall of the
    cluster path on the same corpus (both measured vs the exact GEMM):
    the estimator is only useful if its number is honest."""
    exact = embedding_near_dup_pairs(
        clustered, 0.8, method="gemm"
    ).localCheckpoint(eager=True)
    n_exact = exact.count()
    assert n_exact > 0
    with caplog.at_level(logging.WARNING, logger=LOGGER):
        got = _cluster_near_dup_pairs(
            clustered, 0.8, "vec_id", "embedding",
            n_clusters=None, flop_budget=1e9,
        ).localCheckpoint(eager=True)
    est = _logged_estimate(caplog, "cluster near-dup dispatch")
    assert est is not None, "no recall estimate logged"
    hits = got.join(
        exact.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi"
    ).count()
    true_recall = hits / n_exact
    assert abs(est - true_recall) <= 0.15, (est, true_recall)
    assert est >= 0.7  # clustered shape: the path and estimate are high


def test_lsh_recall_estimate_logged_and_upper_bounds(clustered, caplog):
    """The rp-lsh estimate counts shared-bucket coverage BEFORE the
    hot-bucket cap, so it upper-bounds the path's true recall (modulo
    sampling noise); both are measured here vs exact GEMM."""
    exact = embedding_near_dup_pairs(
        clustered, 0.8, method="gemm"
    ).localCheckpoint(eager=True)
    n_exact = exact.count()
    with caplog.at_level(logging.WARNING, logger=LOGGER):
        got = _lsh_near_dup_pairs(
            clustered, 0.8, "vec_id", "embedding",
            dim=64, n_planes=8, n_tables=4, max_bucket_size=1000,
            recall_sample=100,
        ).localCheckpoint(eager=True)
    est = _logged_estimate(caplog, "rp-lsh near-dup dispatch")
    assert est is not None, "no recall estimate logged"
    hits = got.join(
        exact.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi"
    ).count()
    true_recall = hits / n_exact
    assert est >= true_recall - 0.10, (est, true_recall)
    assert 0.0 <= est <= 1.0


def test_sample_neighbors_deterministic_and_exact(clustered):
    """The sample scan is the ground truth the estimates hang on:
    deterministic across invocations, and its links are exactly the
    above-threshold cosines (spot-checked against the GEMM pairs)."""
    s1, m1 = _sample_exact_neighbors(
        clustered.select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("v")
        ),
        0.8,
        50,
    )
    s2, m2 = _sample_exact_neighbors(
        clustered.select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("v")
        ),
        0.8,
        50,
    )
    assert m1 == m2 == 50
    r1 = sorted(map(tuple, s1.collect()))
    r2 = sorted(map(tuple, s2.collect()))
    assert r1 == r2
    assert len(r1) > 0
    # every sampled link appears in the exact pair set (as (a<b))
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(clustered, 0.8, method="gemm")
        .select("id_a", "id_b")
        .collect()
    }
    for sid, nid, _cos in r1[:200]:
        assert (min(sid, nid), max(sid, nid)) in exact


def test_instrumentation_off_is_silent(clustered, caplog):
    with caplog.at_level(logging.WARNING, logger=LOGGER):
        _cluster_near_dup_pairs(
            clustered, 0.8, "vec_id", "embedding",
            n_clusters=None, flop_budget=1e9, recall_sample=0,
        ).count()
    assert _logged_estimate(caplog, "cluster near-dup dispatch") is None
