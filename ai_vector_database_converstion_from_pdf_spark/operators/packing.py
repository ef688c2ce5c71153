"""Training-batch assembly operators: sequence packing and deterministic
corpus shuffling.

These extend the reference surface toward LLM training-data pipelines
(the reference stops at chunk storage, `vector_store.cpp:131-168`; a
training consumer additionally needs chunks packed into fixed token
budgets and a reproducible global ordering).

Scale design
------------
* ``pack_next_fit`` packs within deterministic hash shards. Packing is
  inherently sequential, so the shard is the parallel unit: each shard
  is one ``applyInPandas`` group, processed independently with one
  shuffle on ``shard``. Memory per task is bounded by corpus/n_shards —
  at 100 TB you raise ``n_shards`` so each shard stays executor-sized,
  and no stage ever sees the global sequence.
* ``shuffle_order`` produces an exact global permutation WITHOUT a
  single-partition window: rows are ranked within 256 hash-prefix
  buckets (distributed window), then bucket offsets (a 256-row
  aggregate) are broadcast back. Because the bucket is a prefix of the
  sort key, (bucket, key) ordering equals global key ordering, so the
  result is identical to ``row_number() OVER (ORDER BY key)`` while
  every big stage stays partition-parallel.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .textstats import ws_token_count

PACK_SCHEMA = (
    "shard INT, doc_id BIGINT, n_tokens BIGINT, pack_id BIGINT, pack_pos INT"
)


def pack_next_fit(
    docs: DataFrame,
    capacity: int = 128,
    n_shards: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Next-fit token packing: within each shard, walk docs in id order
    and append to the current pack while it fits, else open a new pack.

    A doc longer than ``capacity`` gets a pack of its own (never split,
    never dropped — truncation is a downstream choice). Returns one row
    per doc: (shard, doc_id, n_tokens, pack_id, pack_pos) with pack_id
    numbered from 0 per shard and pack_pos the position inside the pack.
    """
    base = docs.select(
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
        F.col(id_col).cast("long").alias("doc_id"),
        ws_token_count(F.col(text_col)).alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pack_ids: list[int] = []
        positions: list[int] = []
        pid, fill, pos = 0, 0, -1
        for n in pdf["n_tokens"]:
            n = int(n)
            if pos < 0:  # first doc in shard
                fill, pos = n, 0
            elif fill + n <= capacity:
                fill += n
                pos += 1
            else:
                pid += 1
                fill, pos = n, 0
            pack_ids.append(pid)
            positions.append(pos)
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        pdf["pack_pos"] = pd.Series(positions, dtype="int32")
        return pdf[["shard", "doc_id", "n_tokens", "pack_id", "pack_pos"]]

    return base.groupBy("shard").applyInPandas(pack, PACK_SCHEMA)


def shuffle_order(
    docs: DataFrame, salt: str = "v1", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic global training order: position = exact rank of
    md5(salt:id). Same salt → same permutation on any cluster layout;
    change the salt to reshuffle between epochs.

    Returns (doc_id, shuffle_key, position) with position 1..N.
    """
    key = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), key.alias("shuffle_key")
    ).withColumn("bucket", F.substring("shuffle_key", 1, 2))

    in_bucket = Window.partitionBy("bucket").orderBy("shuffle_key", "doc_id")
    ranked = base.withColumn("bucket_rank", F.row_number().over(in_bucket))

    # 256-row side table: rows before each bucket. The unpartitioned
    # window is over the tiny aggregate, not the corpus.
    counts = ranked.groupBy("bucket").agg(F.count("*").alias("n"))
    prior = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "bucket", F.coalesce(F.sum("n").over(prior), F.lit(0)).alias("offset")
    )

    return (
        ranked.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "shuffle_key",
            (F.col("offset") + F.col("bucket_rank")).cast("long").alias("position"),
        )
    )


def export_training_shards(
    docs: DataFrame,
    out_dir: str,
    capacity: int = 128,
    n_shards: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Materialize packed training shards: docs joined to their next-fit
    pack assignment, written as parquet partitioned by shard (one
    directory per shard — the unit a training job's data loader maps to
    a worker). Sorting within partitions by (pack_id, pack_pos) keeps
    each pack's members contiguous in the files, so a reader streams
    packs without a shuffle. Returns the per-shard manifest (packs,
    docs, token sum) the loader uses for work assignment."""
    packed = pack_next_fit(docs, capacity, n_shards, id_col, text_col)
    rows = (
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
        .join(packed, "doc_id")
        .select("shard", "pack_id", "pack_pos", "doc_id", "n_tokens", "text")
    )
    (
        rows.repartition("shard")
        .sortWithinPartitions("shard", "pack_id", "pack_pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )
    manifest = (
        rows.groupBy("shard")
        .agg(
            F.count_distinct("pack_id").alias("n_packs"),
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("shard")
    )
    return manifest
