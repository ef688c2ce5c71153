"""Heavy hitters (Misra-Gries + exact recount), weighted priority
sampling, and mixture rebalance — hand-built semantics checks beyond the
DuckDB oracles (text_heavy_hitters, sample_weighted_priority,
source_mixture_sample, events_daily_anomalies in the catalog)."""

import pytest
from pyspark.sql import functions as F


def _gram_df(spark, items, partitions=4):
    return spark.createDataFrame(
        [(i, g) for i, g in enumerate(items)], "id long, gram string"
    ).repartition(partitions)


class TestHeavyHitters:
    def test_exact_vs_bruteforce_with_forced_summarization(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.freqitems import (
            heavy_hitters,
        )

        # 60 distinct tail items + 2 planted heavies; k=25 < vocab forces
        # real MG decrements inside every batch.
        items = (
            ["hot"] * 200
            + ["warm"] * 120
            + [f"tail{i}" for i in range(60)] * 3
        )
        n = len(items)
        phi_bp = 500  # 5% threshold; k=25 satisfies phi >= 1/(k+1)
        got = {
            r["gram"]: r["cnt"]
            for r in heavy_hitters(
                _gram_df(spark, items), phi_bp=phi_bp, k=25
            ).collect()
        }
        import collections

        exact = collections.Counter(items)
        want = {
            g: c for g, c in exact.items() if c * 10000 >= phi_bp * n
        }
        assert got == want
        assert "hot" in got and "warm" in got

    def test_k_too_small_raises(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.freqitems import (
            heavy_hitters,
        )

        with pytest.raises(ValueError):
            heavy_hitters(_gram_df(spark, ["a"]), phi_bp=10, k=5)

    def test_layout_invariance(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.freqitems import (
            heavy_hitters,
        )

        items = ["x"] * 50 + ["y"] * 30 + [f"t{i}" for i in range(40)]
        a = heavy_hitters(_gram_df(spark, items, partitions=1), 1000, k=30).collect()
        b = heavy_hitters(_gram_df(spark, items, partitions=8), 1000, k=30).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_token_ngrams_short_doc_guard(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.freqitems import (
            token_ngrams,
        )

        docs = spark.createDataFrame(
            [(1, "solo"), (2, ""), (3, "two tokens here")],
            "doc_id long, text string",
        )
        rows = token_ngrams(docs, n=2).collect()
        by_id = {}
        for r in rows:
            by_id.setdefault(r["id"], []).append(r["gram"])
        assert 1 not in by_id and 2 not in by_id
        assert by_id[3] == ["two tokens", "tokens here"]


class TestPrioritySample:
    def test_is_permutation_prefix_and_layout_invariant(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.sampling import (
            priority_sample,
        )

        docs = spark.createDataFrame(
            [(i, (i % 7 + 1) * 100) for i in range(200)], "doc_id long, w long"
        )
        a = priority_sample(docs, 30, "w").select("doc_id").collect()
        b = priority_sample(docs.repartition(11), 30, "w").select("doc_id").collect()
        assert [r[0] for r in a] == [r[0] for r in b]
        assert len(set(r[0] for r in a)) == 30

    def test_weight_bias(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.sampling import (
            priority_sample,
        )

        # half the ids get 50x the weight; the heavy class should
        # dominate a 100-of-1000 sample
        docs = spark.createDataFrame(
            [(i, 5000 if i % 2 == 0 else 100) for i in range(1000)],
            "doc_id long, w long",
        )
        got = priority_sample(docs, 100, "w").collect()
        heavy = sum(1 for r in got if r["w"] == 5000)
        assert heavy > 80


class TestMixtureSample:
    def test_rates_and_rare_strata_kept(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.sampling import (
            mixture_sample,
        )

        rows = [(i, "big") for i in range(400)] + [
            (1000 + i, "rare") for i in range(6)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, source string")
        got = mixture_sample(docs, per_stratum_target=10, strat_col="source")
        by_src = {
            r["source"]: r["cnt"]
            for r in got.groupBy("source").agg(F.count("*").alias("cnt")).collect()
        }
        # rare stratum below target: rate clamps to 1.0, kept whole
        assert by_src["rare"] == 6
        # big stratum thinned to ~10 (hash noise tolerated)
        assert 2 <= by_src.get("big", 0) <= 30

    def test_layout_and_salt(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.sampling import (
            mixture_sample,
        )

        docs = spark.createDataFrame(
            [(i, f"s{i % 3}") for i in range(300)], "doc_id long, source string"
        )
        a = sorted(
            r["doc_id"]
            for r in mixture_sample(docs, 20, "source").select("doc_id").collect()
        )
        b = sorted(
            r["doc_id"]
            for r in mixture_sample(docs.repartition(7), 20, "source")
            .select("doc_id")
            .collect()
        )
        c = sorted(
            r["doc_id"]
            for r in mixture_sample(docs, 20, "source", salt="other")
            .select("doc_id")
            .collect()
        )
        assert a == b
        assert a != c  # independent draw under a different salt


class TestDailyAnomalies:
    def test_planted_spike_flagged(self, spark, tmp_path):
        import datetime

        from ai_vector_database_converstion_from_pdf_spark import catalog

        base = datetime.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for day in range(10):
            n = 1000 if day == 5 else 100  # day-5 flood
            for i in range(n):
                rows.append(
                    (eid, base + datetime.timedelta(days=day, seconds=i), 7, "click", 1.0, "{}")
                )
                eid += 1
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
        out = catalog.queries()["events_daily_anomalies"](spark, str(tmp_path))
        flagged = [r for r in out.collect() if r["is_anomaly"]]
        assert len(flagged) == 1
        assert flagged[0]["cnt"] == 1000 and flagged[0]["z"] > 2
