"""Opt-in on-disk similarity/quotient graph index (VERDICT r11 #2).

With SPARK_GRAFT_SIMGRAPH_INDEX set, the first _sim_graph /
_quotient_graph build persists its tables as parquet; a later session
(simulated here by clearing the session memos) serves the SAME graph
from a parquet scan — proven by poisoning the build functions so any
rebuild attempt raises — and every downstream answer is identical.
Unset (the default), nothing is written: bench accounting stays honest.
"""

import os

import pytest
from pyspark.sql import functions as F

from ai_vector_database_converstion_from_pdf_spark import catalog

SRC = "/root/testdata/sf0.001"


@pytest.fixture()
def dup_fixture(spark, tmp_path):
    """Tiny dup-heavy fixture (3x replicas) so the collapse probe fires
    and the quotient path builds."""
    out = str(tmp_path / "fixture")
    os.makedirs(out)
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    rep = docs
    for i in (1, 2):
        rep = rep.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000 * i))
        )
    rep.write.parquet(f"{out}/documents.parquet")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        os.symlink(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
    return out


def _clear_memos():
    catalog._SIM_GRAPH_CACHE.clear()
    catalog._QUOTIENT_CACHE.clear()
    catalog._DUP_PROBE_CACHE.clear()


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_disabled_by_default_writes_nothing(spark, dup_fixture, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SIMGRAPH_INDEX", raising=False)
    _clear_memos()
    assert catalog._graph_index_dir(dup_fixture, "quotient", 3) is None
    q = catalog._quotient_graph(spark, dup_fixture)
    assert q is not None  # dup-heavy: quotient built, only in-session


def test_quotient_served_from_disk(spark, dup_fixture, tmp_path, monkeypatch):
    root = str(tmp_path / "gidx")
    monkeypatch.setenv("SPARK_GRAFT_SIMGRAPH_INDEX", root)
    _clear_memos()
    cls1, qe1, cap1 = catalog._quotient_graph(spark, dup_fixture)
    want_edges = _rows(qe1.orderBy("id_a", "id_b"))
    want_cls = sorted(
        (r["rep"], tuple(r["members"]), r["m"]) for r in cls1.collect()
    )
    d = catalog._graph_index_dir(dup_fixture, "quotient", 3)
    assert os.path.exists(os.path.join(d, "meta.json"))

    # fresh "session": memos cleared AND the builders poisoned — if the
    # second call rebuilds instead of reading parquet, it raises
    _clear_memos()
    from ai_vector_database_converstion_from_pdf_spark.operators import dedup

    def _boom(*a, **k):
        raise AssertionError("rebuild attempted despite on-disk index")

    monkeypatch.setattr(dedup, "simhash_pairs", _boom)
    monkeypatch.setattr(dedup, "exact_collapse_classes", _boom)
    cls2, qe2, cap2 = catalog._quotient_graph(spark, dup_fixture)
    assert cap2 == cap1
    assert _rows(qe2.orderBy("id_a", "id_b")) == want_edges
    got_cls = sorted(
        (r["rep"], tuple(r["members"]), r["m"]) for r in cls2.collect()
    )
    assert got_cls == want_cls

    # downstream: a quotient consumer runs identically off the disk form
    qs = catalog.queries()
    pr = qs["graph_pagerank_simdocs"](spark, dup_fixture)
    assert pr.count() > 0


def test_unique_corpus_verdict_cached(spark, tmp_path, monkeypatch):
    """On a unique-heavy corpus the persisted verdict is 'no quotient' —
    later sessions skip even the collapse probe."""
    root = str(tmp_path / "gidx2")
    monkeypatch.setenv("SPARK_GRAFT_SIMGRAPH_INDEX", root)
    _clear_memos()
    assert catalog._quotient_graph(spark, SRC) is None
    _clear_memos()
    from ai_vector_database_converstion_from_pdf_spark.operators import dedup

    monkeypatch.setattr(
        dedup, "_collapse_probe",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("probed")),
    )
    assert catalog._quotient_graph(spark, SRC) is None


def test_sim_graph_pairs_served_from_disk(
    spark, dup_fixture, tmp_path, monkeypatch
):
    root = str(tmp_path / "gidx3")
    monkeypatch.setenv("SPARK_GRAFT_SIMGRAPH_INDEX", root)
    _clear_memos()
    p1 = _rows(catalog._sim_graph(spark, SRC).orderBy("id_a", "id_b"))
    _clear_memos()
    from ai_vector_database_converstion_from_pdf_spark.operators import graph

    monkeypatch.setattr(
        graph, "similarity_graph",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("rebuilt")),
    )
    p2 = _rows(catalog._sim_graph(spark, SRC).orderBy("id_a", "id_b"))
    assert p2 == p1
