"""Q6/Q14/Q17 serving-layer unit tests."""

from ai_vector_database_converstion_from_pdf_spark.serving import (
    LatencyGovernor,
    QueryCache,
    warmup,
)


class TestLatencyGovernor:
    def test_seed_and_ema(self):
        g = LatencyGovernor()
        assert g.avg_ms == 100.0
        g.observe(1100.0)  # 0.8*100 + 0.2*1100 = 300
        assert abs(g.avg_ms - 300.0) < 1e-9

    def test_ladder(self):
        g = LatencyGovernor()
        assert g.plan(5, 4, "general") == {
            "depth": 20, "vector_branch": True, "mode": "normal"}
        g.avg_ms = 2000.0
        assert g.plan(5, 4, "general")["depth"] == 15
        g.avg_ms = 5000.0
        assert g.plan(5, 4, "general") == {
            "depth": 5, "vector_branch": False, "mode": "critical"}
        # summary intent never bypasses vectors (vector_store.cpp:328)
        assert g.plan(5, 6, "summary")["vector_branch"] is True


class TestQueryCache:
    def test_exact_hit_and_canonicalization(self):
        c = QueryCache()
        c.put("  Hello World ", [1, 2, 3])
        assert c.get("hello world") == [1, 2, 3]
        assert c.hits == 1

    def test_lru_eviction(self):
        c = QueryCache(capacity=2)
        c.put("a", 1)
        c.put("b", 2)
        c.get("a")          # refresh a
        c.put("c", 3)       # evicts b
        assert c.get("b") is None
        assert c.get("a") == 1

    def test_semantic_layer(self):
        c = QueryCache()
        c.put("query one", "res1", embedding=[1.0, 0.0])
        assert c.get("different text", embedding=[0.999, 0.01]) == "res1"
        assert c.get("different text", embedding=[0.0, 1.0]) is None


def test_warmup(spark):
    from tests.conftest import SF_ORACLE

    df = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    assert warmup(df) == 500
    df.unpersist()
