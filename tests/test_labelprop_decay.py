"""Label propagation over pair graphs and decayed engagement."""

import math

from pyspark.sql import Row

from ai_vector_database_converstion_from_pdf_spark.operators.graph import (
    label_propagation,
)


def _nodes(spark, seeds, n):
    return spark.createDataFrame(
        [Row(id=i, seed=seeds.get(i)) for i in range(n)],
        "id long, seed string",
    )


def _edges(spark, pairs):
    return spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in pairs], "id_a long, id_b long"
    )


class TestLabelPropagation:
    def test_chain_spreads_label(self, spark):
        # 0(seed A) - 1 - 2 - 3 : label reaches node 3 in 3 rounds
        res = {
            r.id: r.label
            for r in label_propagation(
                _nodes(spark, {0: "A"}, 4),
                _edges(spark, [(0, 1), (1, 2), (2, 3)]),
                n_rounds=3,
            ).collect()
        }
        assert res == {0: "A", 1: "A", 2: "A", 3: "A"}

    def test_majority_and_tie_break(self, spark):
        # node 4 has neighbors: two B seeds, one A seed -> majority B;
        # node 5 has one A and one B neighbor -> tie -> smaller label A
        nodes = _nodes(spark, {0: "A", 1: "B", 2: "B", 3: "A"}, 6)
        edges = _edges(spark, [(0, 4), (1, 4), (2, 4), (1, 5), (3, 5)])
        res = {
            r.id: r.label
            for r in label_propagation(nodes, edges, n_rounds=1).collect()
        }
        assert res[4] == "B"
        assert res[5] == "A"

    def test_seeds_clamped_and_isolated_stay_null(self, spark):
        nodes = _nodes(spark, {0: "A", 1: "B"}, 4)
        edges = _edges(spark, [(0, 1)])  # nodes 2,3 isolated
        res = {
            r.id: r.label
            for r in label_propagation(nodes, edges, n_rounds=3).collect()
        }
        assert res[0] == "A" and res[1] == "B"  # seeds never flip
        assert res[2] is None and res[3] is None

    def test_layout_invariance(self, spark):
        from .conftest import SF_SMOKE

        from pyspark.sql import functions as F

        from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
            simhash_pairs,
        )

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        pairs = simhash_pairs(docs, max_hamming=3).select("id_a", "id_b")
        nodes = docs.select(
            F.col("doc_id").alias("id"),
            F.when(F.col("doc_id") % 5 == 0, F.col("source")).alias("seed"),
        )
        a = sorted(map(tuple, label_propagation(nodes, pairs, 2).collect()))
        b = sorted(
            map(
                tuple,
                label_propagation(
                    nodes.repartition(7), pairs.repartition(5), 2
                ).collect(),
            )
        )
        assert a == b and len(a) > 0
        assert any(lbl is not None for _, lbl in a)


class TestDecayedEngagement:
    def test_hand_computed(self, spark, duck):
        from ai_vector_database_converstion_from_pdf_spark.catalog import (
            _DECAY_LAMBDA,
            events_decayed_engagement,
        )

        from .conftest import SF_ORACLE

        res = events_decayed_engagement(spark, SF_ORACLE).collect()
        assert res and all(r.engagement >= 0 for r in res)
        # ordering invariant
        eng = [r.engagement for r in res]
        assert eng == sorted(eng, reverse=True)
        # spot-check one user against a direct python recompute
        uid = res[0].user_id
        rows = duck.sql(
            f"""
            SELECT value, epoch(TIMESTAMP '2024-06-01 00:00:00') - epoch(ts) AS age
            FROM events WHERE event_type = 'purchase' AND user_id = {uid}
            """
        ).fetchall()
        expect = sum(
            round(round(v * math.exp(-_DECAY_LAMBDA * (age / 86400.0)), 6) * 1e6)
            for v, age in rows
        ) / 1e6
        assert abs(res[0].engagement - round(expect, 6)) < 1e-9
        assert res[0].n_events == len(rows)
