"""Streaming exact dedup: the first occurrence of a content hash wins
across micro-batches (state-store membership), dups are tagged with
their keeper, and the kept set equals the batch exact_dedup recompute."""

import glob
import shutil

from pyspark.sql import functions as F


def _write_two_drops(spark, tmp_path, rows_a, rows_b):
    path = str(tmp_path / "docs_drops")
    schema = "doc_id long, text string"
    spark.createDataFrame(rows_a, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    tmp2 = str(tmp_path / "drop2")
    spark.createDataFrame(rows_b, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp2)
    for i, f in enumerate(glob.glob(f"{tmp2}/part-*.parquet")):
        shutil.copy(f, f"{path}/zz-second-{i}.parquet")
    return path


def test_streaming_dedup_across_batches(spark, tmp_path):
    from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
        exact_dedup,
    )
    from ai_vector_database_converstion_from_pdf_spark.streaming.ingest_stream import (
        streaming_exact_dedup,
    )

    # batch 1: ids 0-5 with dup contents inside the batch
    rows_a = [(0, "alpha"), (1, "beta"), (2, "Alpha "), (3, "gamma"), (4, "beta"), (5, "delta")]
    # batch 2: re-sends of batch-1 content (cross-batch dups) + new docs
    rows_b = [(6, "alpha"), (7, "epsilon"), (8, "GAMMA"), (9, "zeta")]
    path = _write_two_drops(spark, tmp_path, rows_a, rows_b)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = streaming_exact_dedup(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sdedup")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {r["id"]: r for r in spark.sql("select * from sdedup").collect()}
    assert len(got) == 10  # every row tagged, none silently dropped

    # normalized-content equivalence: 'alpha' == 'Alpha ' (norm_text)
    firsts = sorted(i for i, r in got.items() if r["is_first"])
    assert firsts == [0, 1, 3, 5, 7, 9]
    # cross-batch dup points at the batch-1 keeper
    assert got[6]["dup_of"] == 0 and not got[6]["is_first"]
    assert got[8]["dup_of"] == 3
    # in-batch dups resolved to min id
    assert got[2]["dup_of"] == 0
    assert got[4]["dup_of"] == 1

    # kept set == batch recompute keepers
    all_docs = spark.createDataFrame(
        [(i, t) for i, t in
         [(0, "alpha"), (1, "beta"), (2, "Alpha "), (3, "gamma"), (4, "beta"),
          (5, "delta"), (6, "alpha"), (7, "epsilon"), (8, "GAMMA"), (9, "zeta")]],
        "doc_id long, text string",
    )
    batch_keepers = sorted(
        r["keeper_id"] for r in exact_dedup(all_docs).collect()
    )
    assert firsts == batch_keepers


class TestStreamingTrendingTerms:
    def _drive(self, spark, tmp_path, k):
        import glob
        import shutil

        from ai_vector_database_converstion_from_pdf_spark.streaming.ingest_stream import (
            streaming_trending_terms,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        first = docs.filter(F.col("doc_id") % 2 == 0)
        second = docs.filter(F.col("doc_id") % 2 == 1)
        path = str(tmp_path / "drops")
        first.coalesce(1).write.mode("overwrite").parquet(path)
        tmp2 = str(tmp_path / "drop2")
        second.coalesce(1).write.mode("overwrite").parquet(tmp2)
        for i, f in enumerate(glob.glob(f"{tmp2}/part-*.parquet")):
            shutil.copy(f, f"{path}/zz-second-{i}.parquet")

        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )
        out = streaming_trending_terms(stream, k=k, n_shards=4)
        name = f"trending_{k}"
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        rows = spark.sql(f"SELECT * FROM {name}").collect()
        # per shard, keep only the FINAL micro-batch summary (max shard_n)
        final = {}
        for r in rows:
            cur = final.setdefault(r["shard"], {})
            if not cur or r["shard_n"] > cur["n"]:
                final[r["shard"]] = {"n": r["shard_n"], "items": {}}
            if r["shard_n"] == final[r["shard"]]["n"]:
                final[r["shard"]]["items"][r["term"]] = r["lb"]
        return docs, final

    def test_guarantee_and_bounds_under_forced_decrements(self, spark, tmp_path):
        """k=4 forces MG decrements every batch; the guarantee must
        still hold: every term with true shard count >= n/(k+1) present,
        every lb a lower bound within n/(k+1) of truth, state <= k."""
        import collections

        from ai_vector_database_converstion_from_pdf_spark.functions.text import tokens

        k = 4
        docs, final = self._drive(spark, tmp_path, k)
        # recompute true per-shard counts batch-side
        truth = (
            docs.select(F.explode(tokens(F.col("text"))).alias("term"))
            .withColumn("shard", F.pmod(F.xxhash64("term"), F.lit(4)).cast("int"))
            .groupBy("shard", "term")
            .count()
            .collect()
        )
        per_shard = collections.defaultdict(dict)
        for r in truth:
            per_shard[r["shard"]][r["term"]] = r["count"]
        for shard, items in per_shard.items():
            n = sum(items.values())
            assert final[shard]["n"] == n
            kept = final[shard]["items"]
            assert len(kept) <= k
            bound = n / (k + 1)
            for term, true_cnt in items.items():
                if true_cnt >= bound:
                    assert term in kept, (shard, term, true_cnt, bound)
                if term in kept:
                    assert kept[term] <= true_cnt
                    assert true_cnt - kept[term] <= bound + 1e-9

    def test_exact_when_k_exceeds_vocab(self, spark, tmp_path):
        """k=256 >= vocab: no decrement ever fires, so the final state
        holds EXACT counts for every term."""
        import collections

        from ai_vector_database_converstion_from_pdf_spark.functions.text import tokens

        docs, final = self._drive(spark, tmp_path, 256)
        truth = (
            docs.select(F.explode(tokens(F.col("text"))).alias("term"))
            .withColumn("shard", F.pmod(F.xxhash64("term"), F.lit(4)).cast("int"))
            .groupBy("shard", "term")
            .count()
            .collect()
        )
        per_shard = collections.defaultdict(dict)
        for r in truth:
            per_shard[r["shard"]][r["term"]] = r["count"]
        for shard, items in per_shard.items():
            assert final[shard]["items"] == items
