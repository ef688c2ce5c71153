"""Structured Streaming — the incremental-ingest analog (SURVEY §2.8).

The reference ingests incrementally: chunks are emitted per page and
pushed through a queue-driven embed pipeline with backpressure
(`pdf_processor.cpp:396-404`, `mainwindow.cpp:256-284,713-761`). The
Spark-native equivalent is a file-source stream → transform → sink with
checkpointing; watermarked event-time windows handle late data (a
concept the reference lacks entirely — its "stream" is wall-clock UI
pumping).

These builders return unstarted streaming DataFrames/queries so tests
drive them synchronously with a memory sink + processAllAvailable().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str, max_files: int = 1) -> DataFrame:
    """File-source stream over parquet drops of events (one file per
    micro-batch keeps tests deterministic)."""
    return (
        spark.readStream.format("parquet")
        .schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .load(path)
    )


def windowed_counts(events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling-window aggregation — the event-time analog of
    catalog.events_tumbling_window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def streaming_ingest_chunks(spark: SparkSession, docs_stream: DataFrame, dim: int = 16) -> DataFrame:
    """Incremental chunk+embed: the reference's queue pipeline as a
    stream transform — tiny-chunk filter (I14) then the batched embed UDF
    (I16) — ready for an append sink with checkpointing."""
    from ..functions.embed import make_embed_udf

    embed = make_embed_udf(dim)
    return (
        docs_stream.filter(F.length(F.trim(F.col("text"))) > 3)
        .withColumn("embedding", embed(F.col("text")))
        .withColumn("model_sig", F.lit(f"hash-embed-{dim}"))
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running (event count, value sum) that persists across
    micro-batches — the streaming analog of the reference's cross-batch
    session state (latency EMA / calibration stats are kept on the
    driver there; here state lives in the state store, sharded by key,
    which is the 100 TB-correct place for it).

    Emits one row per (user, micro-batch) with the running totals."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id long, batch_events long, total_events long, total_value double"
    )
    state_schema = "total_events long, total_value double"

    def fn(key, pdf_iter, state: GroupState):
        total_events, total_value = (
            state.get if state.exists else (0, 0.0)
        )
        batch_events = 0
        for pdf in pdf_iter:
            batch_events += len(pdf)
            total_events += len(pdf)
            total_value += float(pdf["value"].sum())
        state.update((total_events, total_value))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "batch_events": [batch_events],
                "total_events": [total_events],
                "total_value": [total_value],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def windowed_counts_epoch(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked tumbling-window aggregation in the EXACT output shape
    of the batch `events_tumbling_window` catalog query
    (window_start_epoch, event_type, n, sum_value) — so append-mode
    emissions are row-for-row comparable against the batch/DuckDB
    answer on the finalized-window subset. The sum rides the same
    decimal(18,6) accumulator as the batch query: order-independent,
    byte-stable across micro-batch boundaries."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("window.start").cast("long").alias("window_start_epoch"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def stage_event_drops(
    events: DataFrame, stream_dir: str, n_drops: int = 4, flush_drop: bool = True
) -> None:
    """Replay a batch events frame as `n_drops` event-time-ordered
    single-file parquet drops under `stream_dir` (one file = one
    micro-batch with maxFilesPerTrigger=1), plus an optional EMPTY
    final drop. The empty drop matters: append-mode emission happens in
    the micro-batch where the watermark (computed from the PREVIOUS
    batch's max event time) passes a window's end, so without a final
    no-data batch the last drop's watermark advance never flushes —
    the empty file forces one more batch and makes "finalized" mean
    exactly `window_end <= global max(ts) - watermark delay`, a
    deterministic, SQL-expressible criterion.

    Files are named and mtime-stamped in replay order (FileStreamSource
    schedules oldest-modTime first; names break ties)."""
    import glob
    import os
    import shutil
    import time as _time

    # time-ordered drops (the production shape: files arrive roughly in
    # event-time order); ntile over ts gives contiguous, deterministic
    # slices. The global window is a one-off replay-staging cost over
    # the fixture, not a query-path pattern.
    from pyspark.sql import Window as _W

    tiled = events.withColumn(
        "_tile",
        F.ntile(n_drops).over(_W.orderBy("ts", "event_id")),
    )
    os.makedirs(stream_dir, exist_ok=True)
    base = _time.time() - 3600
    # ONE write job for all drops: the ntile window already funnels the
    # frame into a single partition, so a partitionBy("_tile") write from
    # that task emits exactly one file per tile directory — versus the
    # previous per-tile loop, which re-ran the global window sort once
    # per drop (n_drops full sorts + n_drops jobs for the same rows).
    stage_all = os.path.join(stream_dir, "_stage_all")
    tiled.write.mode("overwrite").partitionBy("_tile").parquet(stage_all)
    empty_src = None
    for i in range(1, n_drops + 1):
        hits = glob.glob(os.path.join(stage_all, f"_tile={i}", "part-*.parquet"))
        dst = os.path.join(stream_dir, f"drop-{i:03d}.parquet")
        if hits:
            shutil.move(hits[0], dst)
        else:
            # n_drops > row count: ntile left this tile empty and the
            # partitionBy write skipped its directory — emit an empty
            # drop so the replay schedule keeps its file count (the old
            # per-tile coalesce(1) loop wrote an empty part file here)
            if empty_src is None:
                empty_dir = os.path.join(stream_dir, "_stage_empty")
                events.limit(0).coalesce(1).write.mode("overwrite").parquet(empty_dir)
                empty_src = glob.glob(os.path.join(empty_dir, "part-*.parquet"))[0]
            shutil.copy(empty_src, dst)
        os.utime(dst, (base + i, base + i))
    if empty_src is not None:
        shutil.rmtree(os.path.join(stream_dir, "_stage_empty"))
    shutil.rmtree(stage_all)
    if flush_drop:
        part_dir = os.path.join(stream_dir, "_stage_flush")
        events.limit(0).coalesce(1).write.mode("overwrite").parquet(part_dir)
        src = glob.glob(os.path.join(part_dir, "part-*.parquet"))[0]
        dst = os.path.join(stream_dir, f"drop-{n_drops + 1:03d}.parquet")
        shutil.move(src, dst)
        shutil.rmtree(part_dir)
        os.utime(dst, (base + n_drops + 1, base + n_drops + 1))


def run_windowed_counts_job(
    spark: SparkSession,
    stream_dir: str,
    checkpoint_dir: str,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    state_partitions: int | None = None,
) -> list:
    """The end-to-end watermarked event-time job (SURVEY §2.8 depth,
    VERDICT r8 #4): file-source stream over parquet drops → watermarked
    tumbling aggregation → append-mode foreachBatch sink collecting the
    FINALIZED windows. Returns the collected rows (each micro-batch's
    append output is a set of windows the advancing watermark just
    closed — each window emits exactly once).

    Late-data semantics (the state-store contract, proven in
    tests/test_event_time_watermark.py): a late row whose window is
    still open (window_end > current watermark) is merged into that
    window's running state and reflected in its final emission. Spark
    maintains TWO watermarks per micro-batch — late-record FILTERING
    uses the PREVIOUS batch's watermark, state EVICTION the current
    one — so "too late" means window_end <= the filter watermark,
    which lags eviction by one batch: a row arriving in the same
    micro-batch in which its window closes is still merged into that
    window's single emission; from the next batch on it is dropped and
    the emitted count never changes retroactively.

    Scale shape: this is ordinary Structured Streaming — per-batch
    shuffle keyed on (window, event_type), state store holds only OPEN
    windows (bounded by watermark horizon × group cardinality, not by
    stream length), checkpointing makes it exactly-once into an
    idempotent sink."""
    collected: list = []
    stream = read_event_stream(spark, stream_dir)
    agg = windowed_counts_epoch(stream, window=window, watermark=watermark)

    def _sink(batch_df: DataFrame, _epoch: int) -> None:
        collected.extend(batch_df.collect())

    # State-store sharding: a streaming aggregation keeps one state
    # partition per shuffle partition, and every micro-batch pays one
    # task + one checkpoint delta file PER state partition regardless of
    # how little state it holds. State volume here is bounded by the
    # watermark horizon x group cardinality (open windows only), not by
    # stream length, so the shard count is a state-size knob, not a
    # throughput knob — size it to expected open-window cardinality
    # (default 8; SPARK_GRAFT_STREAM_STATE_PARTITIONS overrides, e.g.
    # hundreds on a real cluster with wide key spaces). The result is
    # partition-count independent: per-key state merge is associative.
    import os as _os

    if state_partitions is None:
        state_partitions = int(
            _os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "8")
        )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            agg.writeStream.outputMode("append")
            .foreachBatch(_sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return collected


def run_to_memory(stream_df: DataFrame, name: str) -> None:
    """Drive a streaming DataFrame to completion synchronously (tests)."""
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def streaming_exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Streaming EXACT dedup: emit each document the FIRST time its
    normalized-content hash is seen, across all micro-batches — the
    incremental counterpart of dedup.exact_dedup (a batch groupBy cannot
    run on an unbounded stream).

    State = one row per distinct content hash (keeper id + seen count),
    sharded by hash in the state store — the 100 TB shape: no driver
    membership set, no shuffle beyond the per-key grouping every
    stateful op needs. Emits (id, text_hash, is_first, dup_of): every
    row is tagged rather than silently dropped so the sink can route
    dups to a side channel (quarantine/metrics) instead of losing them."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.dedup import content_hash

    hashed = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(text_col).alias("text"),
        content_hash(F.col(text_col)).alias("text_hash"),
    )
    out_schema = "id long, text_hash string, is_first boolean, dup_of long"
    state_schema = "keeper_id long, seen long"

    def fn(key, pdf_iter, state: GroupState):
        keeper, seen = state.get if state.exists else (None, 0)
        ids, firsts, dups = [], [], []
        for pdf in pdf_iter:
            # order within a batch is nondeterministic; min id first so
            # the keeper choice is stable and engine-reproducible
            for i in sorted(int(x) for x in pdf["id"]):
                seen += 1
                if keeper is None:
                    keeper = i
                    ids.append(i); firsts.append(True); dups.append(None)
                else:
                    ids.append(i); firsts.append(False); dups.append(keeper)
        state.update((keeper, seen))
        yield pd.DataFrame(
            {
                "id": ids,
                "text_hash": [key[0]] * len(ids),
                "is_first": firsts,
                "dup_of": pd.array(dups, dtype="Int64"),
            }
        )

    return hashed.groupBy("text_hash").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def stream_upsert_to_workspace(
    chunks_stream: DataFrame,
    workspace,
    checkpoint: str,
    trigger: dict | None = None,
    compact_every: int = 0,
    max_files_per_bucket: int = 8,
):
    """UPSERT sink: each micro-batch MERGEs into the workspace via
    `Workspace.merge_chunks` — a re-delivered or revised document
    REPLACES its previous chunks instead of duplicating them (plain
    append would double-count on at-least-once delivery). On a bucketed
    workspace each batch rewrites only the buckets its doc_ids hash to.
    Returns the started StreamingQuery; callers own stop().

    By default the query DRAINS the currently-available files and stops
    (trigger availableNow — the batch-catchup shape). For a long-lived
    continuous sink pass e.g. trigger={"processingTime": "30 seconds"}.

    The merge itself is idempotent (same batch re-applied = same table),
    which is what makes the at-least-once file source safe here.

    `compact_every=N` runs `Workspace.optimize(max_files_per_bucket)`
    after every N non-empty batches — a long-lived sink otherwise
    accretes one file per touched bucket per batch until scans drown in
    footer reads (the small-file problem compaction exists for). The
    compaction is itself a versioned swap, so a crash between merge and
    compact loses nothing."""
    n_batches = {"n": 0}

    def _merge_batch(batch_df: DataFrame, _epoch: int) -> None:
        if batch_df.isEmpty():
            return
        workspace.merge_chunks(batch_df)
        n_batches["n"] += 1
        if compact_every and n_batches["n"] % compact_every == 0:
            workspace.optimize(max_files_per_bucket=max_files_per_bucket)

    return (
        chunks_stream.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def session_aggregates(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Event-time session windows via the built-in `session_window`
    (dynamic-gap analog of catalog.events_sessionize's lag-walk): a
    session absorbs events until `gap` of silence, and emits — in append
    mode — only once the watermark passes its close, i.e. exactly when
    no late event can reopen it. State per open session lives in the
    state store keyed by (user, session), so scale-out is by user hash,
    same as the batch shuffle."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def click_purchase_attribution(
    clicks: DataFrame, purchases: DataFrame, attribution_window: str = "30 minutes"
) -> DataFrame:
    """Stream-stream interval join: each purchase attributed to the
    clicks the same user made in the preceding attribution window.
    Both sides carry watermarks, so the join state for a click is
    dropped once no future purchase can match it (bounded state — the
    property that makes a stream-stream join runnable forever). Inner
    join, so matches emit as soon as both sides arrive; the watermark
    only bounds state, never delays output."""
    c = (
        clicks.withWatermark("ts", "1 hour")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", "1 hour")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {attribution_window}")
        ),
        "inner",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def streaming_trending_terms(
    docs: DataFrame, k: int = 64, n_shards: int = 8, text_col: str = "text"
) -> DataFrame:
    """Streaming heavy-hitter terms: a per-shard Misra-Gries summary
    maintained ACROSS micro-batches in the state store — the incremental
    counterpart of operators/freqitems.heavy_hitters (a batch groupBy
    over the full vocabulary cannot run on an unbounded stream, and
    keeping exact per-term state would grow the store vocabulary-sized).

    State = at most k (term, lower-bound count) counters per shard plus
    the shard's total token count. The MG merge bound survives
    incremental reduction: every reduce-to-k subtracts the (k+1)-st
    largest count from all counters, and the subtracted mass is ≤
    shard_n/(k+1) cumulatively — so ANY term with true shard frequency
    ≥ shard_n/(k+1) is guaranteed present in the state, and every kept
    count is a lower bound undercounting by at most shard_n/(k+1)
    (Agarwal et al., Mergeable Summaries). tests/test_streaming_dedup.py
    drives both properties against a batch recompute.

    Emits the full current summary per (shard, micro-batch):
    (shard, term, lb, shard_n) — downstream picks its threshold."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..functions.text import tokens

    sharded = docs.select(
        F.explode(tokens(F.col(text_col))).alias("term")
    ).withColumn("shard", F.pmod(F.xxhash64("term"), F.lit(n_shards)).cast("int"))

    out_schema = "shard int, term string, lb long, shard_n long"
    state_schema = "terms array<string>, cnts array<long>, n long"

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            terms, cnts, n = state.get
            d = dict(zip(terms, (int(c) for c in cnts)))
        else:
            d, n = {}, 0
        for pdf in pdf_iter:
            n += len(pdf)
            for t, c in pdf["term"].value_counts().items():
                d[t] = d.get(t, 0) + int(c)
        if len(d) > k:
            cut = sorted(d.values(), reverse=True)[k]  # (k+1)-st largest
            d = {t: c - cut for t, c in d.items() if c - cut > 0}
        # deterministic state/emit order: count desc, term asc
        items = sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))
        state.update(([t for t, _ in items], [c for _, c in items], n))
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(items),
                "term": [t for t, _ in items],
                "lb": [c for _, c in items],
                "shard_n": [n] * len(items),
            }
        )

    return sharded.groupBy("shard").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def stream_dedup_upsert_to_workspace(
    chunks_stream: DataFrame,
    workspace,
    checkpoint: str,
    threshold: float = 0.8,
    trigger: dict | None = None,
):
    """Dedup-on-ingest UPSERT sink: every micro-batch is first checked
    against the ALREADY-INGESTED corpus with the incremental LSH path
    (`dedup.incremental_lsh_pairs` — batch band keys broadcast, O(batch)
    arrival cost, no corpus-internal pair work); rows that near-dup an
    existing chunk are QUARANTINED to `dup_quarantine` (id, doc_id,
    dup_of, jaccard — never silently dropped, the streaming_exact_dedup
    convention), and only fresh rows MERGE into the workspace.

    Within-batch dups: the batch is also checked against itself via the
    same banding (keeper = smallest id), so two copies arriving in ONE
    micro-batch don't both land.

    Scale shape per batch: one corpus scan for band keys (at production
    scale, swap in the persisted maintained index — sinks.build_ann_index
    idiom), broadcast batch bands, candidate-only verify; the merge
    itself is the bucket-scoped upsert."""
    from ..operators.dedup import incremental_lsh_pairs, minhash_lsh_pairs

    def _batch(batch_df: DataFrame, _epoch: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df = batch_df.persist()
        try:
            docs = batch_df.select("id", "text")
            # within-batch near-dups: keeper = smallest id
            intra = (
                minhash_lsh_pairs(docs, threshold, id_col="id", text_col="text")
                .groupBy(F.col("id_b").alias("new_id"))
                .agg(
                    F.min("id_a").alias("dup_of"),
                    F.max("jaccard").alias("jaccard"),
                )
            )
            if workspace._exists("chunks"):
                corpus = workspace.chunks(fold_boosts=False).select("id", "text")
                inter = (
                    incremental_lsh_pairs(
                        corpus, docs, threshold, id_col="id", text_col="text"
                    )
                    .groupBy("new_id")
                    .agg(
                        F.min("corpus_id").alias("dup_of"),
                        F.max("jaccard").alias("jaccard"),
                    )
                )
                dup_map = inter.unionByName(intra)
            else:
                dup_map = intra
            dup_map = (
                dup_map.groupBy("new_id")
                .agg(
                    F.min("dup_of").alias("dup_of"),
                    F.max("jaccard").alias("jaccard"),
                )
                .withColumnRenamed("new_id", "id")
            )
            tagged = batch_df.join(F.broadcast(dup_map), "id", "left")
            fresh = tagged.filter(F.col("dup_of").isNull()).drop(
                "dup_of", "jaccard"
            )
            dups = tagged.filter(F.col("dup_of").isNotNull()).select(
                "id",
                "doc_id",
                F.col("dup_of").cast("long"),
                "jaccard",
                F.current_timestamp().alias("quarantined_at"),
            )
            if not dups.isEmpty():
                dups.write.mode("append").parquet(
                    workspace._tbl("dup_quarantine")
                )
            if not fresh.isEmpty():
                workspace.merge_chunks(fresh)
        finally:
            batch_df.unpersist()

    return (
        chunks_stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def streaming_funnel_counts(events: DataFrame) -> DataFrame:
    """Flink-CEP-style streaming pattern detection: the strict funnel
    `view, click+, purchase` counted per user ACROSS micro-batches —
    the incremental counterpart of the batch `events_sequence_pattern`
    catalog entry, with identical non-overlapping leftmost-match
    semantics (tests drive the equivalence against the batch regexp).

    The whole pattern lives in a 3-state automaton, so per-user state
    is two integers — (dfa_state, n_strict) — regardless of history
    length: S0 --v--> S1 --c--> S2 --p--> match (reset to S0); a `v`
    restarts S1 from anywhere (a fresh candidate window), any other
    code falls back to S0. That constant-size state is what makes the
    operator stream-safe where the batch entry's collect_list is not.

    Events are ordered by (ts, event_id) WITHIN each micro-batch by
    the operator itself; the cross-batch contract is per-user in-order
    arrival (split drops on event time — the standard CEP source
    contract; compose with a watermarked sort upstream for late data).

    Emits one row per (user, micro-batch): batch_matches plus the
    running n_strict."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, batch_matches long, n_strict long"
    state_schema = "dfa long, n_strict long"

    def fn(key, pdf_iter, state: GroupState):
        dfa, n = state.get if state.exists else (0, 0)
        start = n
        frames = [pdf for pdf in pdf_iter]
        pdf = pd.concat(frames).sort_values(["ts", "event_id"])
        for et in pdf["event_type"]:
            code = et[:1]
            if code == "v":
                dfa = 1
            elif code == "c":
                dfa = 2 if dfa in (1, 2) else 0
            elif code == "p" and dfa == 2:
                n += 1
                dfa = 0
            else:
                dfa = 0
        state.update((dfa, n))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "batch_matches": [n - start],
                "n_strict": [n],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_dsir_score(
    docs_stream: DataFrame,
    lam_rows,
    n_buckets: int = 512,
    text_col: str = "text",
) -> DataFrame:
    """Score ARRIVING documents against a frozen DSIR model — the
    streaming end of the selection pipeline (train the lambda table
    offline with `sampling.dsir_lambda`, collect its <= n_buckets rows,
    ship them here): each micro-batch row gains (n_tokens, weight) via
    `sampling.dsir_score_expr`, a stateless map-side projection — no
    aggregation state, no watermark, exact integer arithmetic identical
    to the batch scorer. dsir_lambda emits the FULL bucket spine, so
    new-vocabulary tokens get their true add-one-smoothed log-ratio
    (an empty/partial model falls back to 0 per token). Use it to
    route incoming crawl shards into keep/review/drop lanes at ingest
    time instead of re-scoring the corpus after the fact."""
    from ..operators.sampling import dsir_score_expr

    lam = {int(r["bucket"]): int(r["lam_micro"]) for r in lam_rows}
    scored = dsir_score_expr(F.col(text_col), lam, n_buckets)
    return docs_stream.withColumn("_dsir", scored).select(
        "*", F.col("_dsir.n_tokens").alias("n_tokens"),
        F.col("_dsir.weight").alias("weight"),
    ).drop("_dsir")


def streaming_attribution(events: DataFrame) -> DataFrame:
    """Streaming first/last-touch attribution: the incremental
    counterpart of the batch `events_attribution` catalog entry. Emits
    one row per conversion (user_id, first_touch, last_touch, value);
    a downstream streaming agg turns that into the touch matrix.

    Per-user state is TWO short strings — (first non-purchase touch
    ever, most recent non-purchase touch) — regardless of history
    length; the batch entry's unbounded rows-preceding window frames
    cannot stream, this constant-size state can (the
    streaming_funnel_counts design). Same cross-batch contract: events
    arrive per-user in event-time order across drops (micro-batch
    interiors are sorted by (ts, event_id) here)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id long, first_touch string, last_touch string, value double"
    )
    state_schema = "first_touch string, last_touch string"

    def fn(key, pdf_iter, state: GroupState):
        ft, lt = state.get if state.exists else (None, None)
        frames = [pdf for pdf in pdf_iter]
        pdf = pd.concat(frames).sort_values(["ts", "event_id"])
        out = []
        for et, v in zip(pdf["event_type"], pdf["value"]):
            if et == "purchase":
                out.append((key[0], ft or "none", lt or "none", float(v)))
            else:
                if ft is None:
                    ft = et
                lt = et
        state.update((ft, lt))
        yield pd.DataFrame(
            out, columns=["user_id", "first_touch", "last_touch", "value"]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_token_quota(
    docs: DataFrame, budget: int = 400
) -> DataFrame:
    """Streaming per-source token-quota admission: docs are admitted in
    ARRIVAL order while their source's cumulative token count stays
    within `budget`; once a source's quota is exhausted every later doc
    from it is rejected (emitted with admitted=false so the caller can
    quarantine rather than silently drop). The ingest-control
    counterpart of the batch `token_budget_select` entry — batch
    selection can re-rank by quality, a stream cannot, so the contract
    here is explicitly arrival-order (the difference is documented, not
    hidden).

    Zero-token docs are ADMITTED: they cost nothing against the quota,
    and rejecting them would conflate "empty" with "over budget". (The
    batch operator drops them from its output instead — it selects a
    corpus, while this emits one verdict per arriving doc; callers who
    want the batch behavior filter tok_cnt > 0 downstream.)

    Per-source state: ONE long (tokens admitted so far), regardless of
    history. Micro-batch interiors are ordered by doc_id for
    deterministic replay."""
    import re

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "doc_id long, source string, tok_cnt long, cum_tokens long, "
        "admitted boolean"
    )
    state_schema = "used long"

    def fn(key, pdf_iter, state: GroupState):
        (used,) = state.get if state.exists else (0,)
        frames = [pdf for pdf in pdf_iter]
        pdf = pd.concat(frames).sort_values("doc_id")
        out = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            toks = len(
                [t for t in re.split(r"[^a-z0-9]+", str(text).lower()) if t]
            )
            if used + toks <= budget:
                used += toks
                out.append((int(doc_id), key[0], toks, used, True))
            else:
                out.append((int(doc_id), key[0], toks, used, False))
        state.update((used,))
        yield pd.DataFrame(
            out,
            columns=["doc_id", "source", "tok_cnt", "cum_tokens", "admitted"],
        )

    return docs.groupBy("source").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
