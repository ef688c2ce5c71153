"""Round-3 dedup-family extensions: sorted-neighborhood, PPJoin prefix
filtering, and quality-aware canonical selection."""

import pytest
from pyspark.sql import Row, functions as F

from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
    ngram_jaccard_pairs,
    ngram_jaccard_prefix_pairs,
    quality_canonical,
    sorted_neighborhood_pairs,
)

from .conftest import SF_SMOKE


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


class TestSortedNeighborhood:
    def test_finds_planted_prefix_dups(self, spark):
        # near-identical docs share the normalized prefix -> adjacent in
        # sorted order -> surfaced within any window >= 2
        rows = [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta iota"),
            (3, "completely different words here about ships"),
            (4, "zulu yankee xray whiskey victor uniform tango"),
        ]
        pairs = sorted_neighborhood_pairs(
            _docs(spark, rows), window=2, threshold=0.7
        ).collect()
        assert {(p.id_a, p.id_b) for p in pairs} == {(1, 2)}
        assert pairs[0].jaccard == pytest.approx(7 / 9, abs=1e-6)

    def test_layout_invariance(self, spark):
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        a = sorted(
            (r.id_a, r.id_b, r.jaccard)
            for r in sorted_neighborhood_pairs(docs, 6, 0.85).collect()
        )
        b = sorted(
            (r.id_a, r.id_b, r.jaccard)
            for r in sorted_neighborhood_pairs(
                docs.repartition(13), 6, 0.85
            ).collect()
        )
        assert a == b and len(a) > 0

    def test_window_monotone(self, spark):
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        small = {
            (r.id_a, r.id_b)
            for r in sorted_neighborhood_pairs(docs, 3, 0.8).collect()
        }
        big = {
            (r.id_a, r.id_b)
            for r in sorted_neighborhood_pairs(docs, 8, 0.8).collect()
        }
        assert small <= big


class TestPrefixFilter:
    def test_equals_uncapped_bruteforce(self, spark):
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        exact = sorted(
            (r.id_a, r.id_b, r.jaccard)
            for r in ngram_jaccard_pairs(
                docs, threshold=0.7, max_doc_freq=None
            ).collect()
        )
        pref = sorted(
            (r.id_a, r.id_b, r.jaccard)
            for r in ngram_jaccard_prefix_pairs(docs, threshold=0.7).collect()
        )
        assert pref == exact and len(exact) > 0

    def test_prefix_index_smaller_than_full(self, spark):
        # the point of the optimization: far fewer postings indexed
        from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
            word_shingles,
        )

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        full = word_shingles(docs, 3).count()
        t = 0.8
        from pyspark.sql import Window as W

        raw = word_shingles(docs, 3)
        dfc = raw.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        sh = raw.join(dfc, "shingle")
        w = W.partitionBy("id").orderBy("df", "shingle")
        sized = sh.select(
            "id",
            F.row_number().over(w).alias("pos"),
            F.count(F.lit(1)).over(W.partitionBy("id")).alias("sz"),
        )
        prefix_n = sized.filter(
            F.col("pos")
            <= F.col("sz") - F.ceil(F.lit(t) * F.col("sz") - F.lit(1e-9)) + 1
        ).count()
        assert prefix_n < 0.4 * full

    def test_hot_shingle_robust(self, spark):
        # a shingle present in EVERY doc would explode the capped plan's
        # candidate bound; the prefix plan never indexes it yet still
        # finds the one true near-dup pair
        boiler = "the quick brown fox jumps over the lazy dog again"
        rows = [(i, f"{boiler} unique{i} filler{i} words{i} pad{i}") for i in range(20)]
        rows.append((100, rows[0][1].replace("pad0", "pad0x")))
        pairs = ngram_jaccard_prefix_pairs(
            _docs(spark, rows), threshold=0.6
        ).collect()
        assert (0, 100) in {(p.id_a, p.id_b) for p in pairs}


class TestQualityCanonical:
    def test_keeper_is_max_quality(self, spark):
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        pairs = ngram_jaccard_pairs(docs, threshold=0.5, max_doc_freq=50)
        res = quality_canonical(docs, pairs).collect()
        by_cluster = {}
        for r in res:
            by_cluster.setdefault(r.cluster_id, []).append(r)
        multi = [v for v in by_cluster.values() if len(v) > 1]
        assert multi, "expected at least one non-trivial cluster"
        for members in by_cluster.values():
            keeper = [m for m in members if not m.is_dup]
            assert len(keeper) == 1
            k = keeper[0]
            assert all(m.keeper_id == k.id for m in members)
            # keeper maximizes (quality, -id)
            best = max(members, key=lambda m: (m.quality, -m.id))
            assert k.id == best.id

    def test_prefers_clean_copy(self, spark):
        base = "this is a perfectly reasonable document about engines and the data they process"
        mangled = base + " ;;; !!! ### $$$ %%% ^^^ &&& *** ((( )))"
        rows = [(1, mangled), (2, base), (3, "unrelated text entirely different")]
        pairs = ngram_jaccard_pairs(_docs(spark, rows), threshold=0.5, max_doc_freq=None)
        res = {r.id: r for r in quality_canonical(_docs(spark, rows), pairs).collect()}
        # cluster {1,2}: id 1 is smaller but dirtier; quality picks 2
        assert res[1].keeper_id == 2 and res[1].is_dup
        assert res[2].keeper_id == 2 and not res[2].is_dup
        assert res[3].keeper_id == 3 and not res[3].is_dup
