"""Tests for training-batch assembly (packing, shuffle order) and TF-IDF."""

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _load_docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


class TestPackNextFit:
    CAP = 128

    def _packed(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.packing import (
            pack_next_fit,
        )

        return pack_next_fit(_load_docs(spark), capacity=self.CAP, n_shards=8)

    def test_every_doc_assigned_once(self, spark):
        docs = _load_docs(spark)
        packed = self._packed(spark)
        assert packed.count() == docs.count()
        assert packed.select("doc_id").distinct().count() == docs.count()

    def test_pack_fill_within_capacity_unless_singleton(self, spark):
        rows = self._packed(spark).collect()
        fills: dict[tuple, int] = {}
        sizes: dict[tuple, int] = {}
        for r in rows:
            key = (r["shard"], r["pack_id"])
            fills[key] = fills.get(key, 0) + r["n_tokens"]
            sizes[key] = sizes.get(key, 0) + 1
        over = [k for k, v in fills.items() if v > self.CAP]
        # an over-full pack is only legal when it holds exactly one
        # over-long doc (next-fit never splits)
        assert all(sizes[k] == 1 for k in over)

    def test_matches_sequential_recompute(self, spark):
        """The distributed result must equal a plain python next-fit walk
        of each shard in doc_id order."""
        rows = sorted(self._packed(spark).collect(), key=lambda r: r["doc_id"])
        by_shard: dict[int, list] = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append(r)
        for shard, docs in by_shard.items():
            pid, fill = 0, None
            pos = 0
            for i, r in enumerate(docs):
                n = r["n_tokens"]
                if fill is None:
                    fill, pos = n, 0
                elif fill + n <= self.CAP:
                    fill += n
                    pos += 1
                else:
                    pid += 1
                    fill, pos = n, 0
                assert (r["pack_id"], r["pack_pos"]) == (pid, pos), (
                    shard,
                    i,
                    r,
                )

    def test_partition_layout_invariance(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.packing import (
            pack_next_fit,
        )

        docs = _load_docs(spark)
        a = pack_next_fit(docs, capacity=self.CAP, n_shards=8)
        b = pack_next_fit(docs.repartition(13), capacity=self.CAP, n_shards=8)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


class TestShuffleOrder:
    def test_exact_permutation(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.packing import (
            shuffle_order,
        )

        docs = _load_docs(spark)
        out = shuffle_order(docs, salt="v1")
        n = docs.count()
        positions = [r["position"] for r in out.collect()]
        assert sorted(positions) == list(range(1, n + 1))

    def test_rank_equals_key_order(self, spark):
        """position must be the exact global rank of the shuffle key —
        the bucketed two-level ranking is an implementation detail."""
        from ai_vector_database_converstion_from_pdf_spark.operators.packing import (
            shuffle_order,
        )

        rows = shuffle_order(_load_docs(spark), salt="v1").collect()
        by_key = sorted(rows, key=lambda r: (r["shuffle_key"], r["doc_id"]))
        assert [r["position"] for r in by_key] == list(range(1, len(rows) + 1))

    def test_layout_invariant_and_salt_sensitive(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.packing import (
            shuffle_order,
        )

        docs = _load_docs(spark)
        a = {r["doc_id"]: r["position"] for r in shuffle_order(docs, "v1").collect()}
        b = {
            r["doc_id"]: r["position"]
            for r in shuffle_order(docs.repartition(17), "v1").collect()
        }
        c = {r["doc_id"]: r["position"] for r in shuffle_order(docs, "v2").collect()}
        assert a == b
        assert a != c  # different epoch salt reshuffles


class TestTfidf:
    def test_hand_computed_scores(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.tfidf import (
            tfidf_top_terms,
        )

        docs = spark.createDataFrame(
            [
                (1, "apple apple banana"),
                (2, "banana cherry"),
                (3, "cherry cherry cherry date"),
            ],
            "doc_id long, text string",
        )
        out = {
            (r["doc_id"], r["term"]): r
            for r in tfidf_top_terms(docs, k=4).collect()
        }
        # apple: tf=2 in doc1, df=1, N=3 -> 2*(ln(4/2)+1)
        exp = round(2 * (math.log(4 / 2) + 1), 6)
        assert out[(1, "apple")]["tfidf"] == exp
        assert out[(1, "apple")]["rank"] == 1
        # banana appears in docs 1 and 2 -> df=2
        assert out[(1, "banana")]["df"] == 2
        exp_b = round(1 * (math.log(4 / 3) + 1), 6)
        assert out[(2, "banana")]["tfidf"] == exp_b
        # doc3: cherry tf=3 dominates date
        assert out[(3, "cherry")]["rank"] == 1
        assert out[(3, "date")]["rank"] == 2

    def test_k_truncation_and_tiebreak(self, spark):
        from ai_vector_database_converstion_from_pdf_spark.operators.tfidf import (
            tfidf_top_terms,
        )

        docs = _load_docs(spark)
        out = tfidf_top_terms(docs, k=3)
        per_doc = out.groupBy("doc_id").agg(F.count("*").alias("n"))
        assert per_doc.filter(F.col("n") > 3).count() == 0
        # within a doc, ranks ordered by (tfidf desc, term asc)
        rows = out.filter(F.col("doc_id") < 20).collect()
        by_doc: dict[int, list] = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for rs in by_doc.values():
            rs.sort(key=lambda r: r["rank"])
            keys = [(-r["tfidf"], r["term"]) for r in rs]
            assert keys == sorted(keys)


class TestShardExport:
    def test_export_roundtrip_and_manifest(self, spark, tmp_path):
        from ai_vector_database_converstion_from_pdf_spark.operators.packing import (
            export_training_shards,
            pack_next_fit,
        )

        docs = _load_docs(spark)
        out = str(tmp_path / "shards")
        manifest = export_training_shards(docs, out, capacity=128, n_shards=8)
        m = {r["shard"]: r for r in manifest.collect()}
        assert sum(r["n_docs"] for r in m.values()) == docs.count()

        back = spark.read.parquet(out)
        # shard partition dirs exist and carry the partition column
        assert sorted(r["shard"] for r in back.select("shard").distinct().collect()) == sorted(m)
        # pack assignment in the export equals a fresh pack run
        fresh = {
            r["doc_id"]: (r["shard"], r["pack_id"], r["pack_pos"])
            for r in pack_next_fit(docs, 128, 8).collect()
        }
        for r in back.collect():
            assert fresh[r["doc_id"]] == (r["shard"], r["pack_id"], r["pack_pos"])
        # manifest token sums match the data
        got = {
            r["shard"]: r["t"]
            for r in back.groupBy("shard").agg(F.sum("n_tokens").alias("t")).collect()
        }
        assert got == {k: v["total_tokens"] for k, v in m.items()}
