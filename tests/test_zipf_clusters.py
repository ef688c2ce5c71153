"""Zipf-sized clusters (r13, VERDICT r12 #5): hot-cluster skew is the
untested adversary for the cluster-GEMM k rule, IVF probe allocation,
and the family selector. The fixture generator gains
`--cluster-sizes zipf` (mass ∝ 1/(rank+1): the hottest of 16 clusters
holds ~34% of the corpus vs 6.25% balanced); these floors pin the
measured outcomes on that shape.

Measured (sf0.01 ×2, 1000 vectors, 16 Zipf blobs, τ=0.8):
- budget-k (26) + smallest-id centroids: candidate recall 0.661 — the
  skew failure this round fixed;
- k-means++ seeding alone: 0.783;
- natural-k override (k = sampled blob count) + k-means++: 1.000.
"""

from __future__ import annotations

import logging
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from tools.make_stress_fixture import _clustered_vec  # noqa: E402

from ai_vector_database_converstion_from_pdf_spark.operators import (  # noqa: E402
    semantic,
    similarity,
)
from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (  # noqa: E402
    _cluster_near_dup_pairs,
    embedding_near_dup_pairs,
)

# stress-tier sweep on generated fixtures: opt-in (VERDICT r13 #8)
pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.01"
LOGGER = "ai_vector_database_converstion_from_pdf_spark.operators.dedup"


@pytest.fixture(scope="module")
def zipf(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    reps = spark.range(2).select(F.col("id").alias("_rep"))
    return (
        emb.crossJoin(F.broadcast(reps))
        .withColumn("embedding", _clustered_vec(F, 16, 0.5, sizes="zipf"))
        .select(
            (F.col("vec_id") + F.col("_rep") * 10_000_000).alias("vec_id"),
            "embedding",
        )
        .localCheckpoint(eager=True)
    )


def test_zipf_generator_plants_skew(zipf, spark):
    """The hottest cluster must hold several times the balanced share —
    recovered by re-deriving the inverse-CDF draw the generator uses."""
    w = [1.0 / (i + 1) for i in range(16)]
    tot = sum(w)
    cum, acc = [], 0.0
    for x in w[:-1]:
        acc += x / tot
        cum.append(acc)
    base = spark.read.parquet(f"{SF}/embeddings.parquet")
    draw = F.pmod(
        F.xxhash64(F.col("vec_id"), F.lit("cidz")), F.lit(1_000_003)
    ).cast("double") / F.lit(1_000_003.0)
    cid = F.size(F.filter(F.lit(cum), lambda b: b <= draw))
    sizes = [
        r["count"]
        for r in base.withColumn("cid", cid).groupBy("cid").count().collect()
    ]
    n = sum(sizes)
    assert max(sizes) / n >= 0.25, sizes  # ~0.34 measured; 4x balanced
    assert min(sizes) / n <= 0.04, sizes


def test_cluster_path_full_recall_on_zipf(zipf, caplog):
    """The r13 headline floor: natural-k override + k-means++ seeding
    keep the cluster path at full candidate recall on the skewed shape
    where the budget-k rule measured 0.661. The override must announce
    itself in the log."""
    exact = embedding_near_dup_pairs(
        zipf, 0.8, method="gemm", recall_sample=0
    ).localCheckpoint(eager=True)
    n_exact = exact.count()
    assert n_exact > 0
    with caplog.at_level(logging.WARNING, logger=LOGGER):
        got = _cluster_near_dup_pairs(
            zipf, 0.8, "vec_id", "embedding",
            n_clusters=None, flop_budget=1e7,
        ).localCheckpoint(eager=True)
    assert any(
        "natural-k override" in r.getMessage() for r in caplog.records
    ), "override did not engage on the blobby shape"
    hits = got.join(
        exact.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi"
    ).count()
    assert got.count() == hits, "false positives"
    recall = hits / n_exact
    assert recall >= 0.95, f"zipf cluster-path recall {recall}"


def test_explicit_k_respected_no_override(zipf, caplog):
    with caplog.at_level(logging.WARNING, logger=LOGGER):
        _cluster_near_dup_pairs(
            zipf, 0.8, "vec_id", "embedding",
            n_clusters=12, flop_budget=1e7, recall_sample=0,
        ).count()
    assert not any(
        "natural-k override" in r.getMessage() for r in caplog.records
    )


def test_selector_and_ivf_hold_on_zipf(zipf):
    """probe → clustered; ann_topk auto → IVF-auto; recall@10 floor on
    the skewed shape (measured 1.0)."""
    p = similarity.probe_corpus_structure(zipf)
    assert p["clustered"] is True, p
    idx = similarity.ann_auto_index(zipf)
    assert idx["family"] == "ivf-auto"
    qrows = (
        zipf.filter(F.col("vec_id") < 10)
        .select("vec_id", "embedding")
        .collect()
    )
    total = 0.0
    for r in qrows:
        qv = list(r["embedding"])
        exact = {
            int(x[0]) for x in semantic.semantic_topk(zipf, qv, k=10).collect()
        }
        got = {
            int(x[0])
            for x in similarity.ann_topk(zipf, qv, k=10, index=idx).collect()
        }
        total += len(exact & got) / 10
    assert total / len(qrows) >= 0.90, total / len(qrows)
