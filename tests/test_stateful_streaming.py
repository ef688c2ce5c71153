"""applyInPandasWithState: per-user running totals must accumulate
ACROSS micro-batches (state store persistence), and the final totals
must equal the batch recompute."""

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def test_state_persists_across_microbatches(spark, tmp_path):
    from ai_vector_database_converstion_from_pdf_spark.sources.tables import load_events
    from ai_vector_database_converstion_from_pdf_spark.streaming.ingest_stream import (
        read_event_stream,
        stateful_user_totals,
    )

    ev = load_events(spark, SF_ORACLE).filter(F.col("user_id") < 20).limit(400).cache()
    # two separate file drops → two micro-batches (maxFilesPerTrigger=1)
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    path = str(tmp_path / "drops")
    first.coalesce(1).write.mode("overwrite").parquet(path)
    import glob
    import shutil

    # write the second drop as an additional file in the same dir
    tmp2 = str(tmp_path / "drop2")
    second.coalesce(1).write.mode("overwrite").parquet(tmp2)
    for i, f in enumerate(glob.glob(f"{tmp2}/part-*.parquet")):
        shutil.copy(f, f"{path}/zz-second-{i}.parquet")

    stream = read_event_stream(spark, path, max_files=1)
    out = stateful_user_totals(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("user_totals")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("SELECT * FROM user_totals").collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r)
    # at least one user appears in both micro-batches with growing totals
    multi = {u: rs for u, rs in per_user.items() if len(rs) >= 2}
    assert multi, "expected users spanning micro-batches"
    for u, rs in multi.items():
        rs.sort(key=lambda r: r["total_events"])
        assert rs[-1]["total_events"] == sum(r["batch_events"] for r in rs)

    # final totals equal batch recompute
    batch = {
        r["user_id"]: (r["n"], r["s"])
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    for u, rs in per_user.items():
        last = max(rs, key=lambda r: r["total_events"])
        n, s = batch[u]
        assert last["total_events"] == n
        assert abs(last["total_value"] - s) < 1e-6


def test_session_windows_close_on_watermark(spark, tmp_path):
    """Streaming session_window must emit exactly the sessions the batch
    recompute produces, once the watermark passes them. A far-future
    sentinel event advances the watermark so every real session closes;
    the sentinel's own session stays pending by design."""
    from ai_vector_database_converstion_from_pdf_spark.sources.tables import load_events
    from ai_vector_database_converstion_from_pdf_spark.streaming.ingest_stream import (
        read_event_stream,
        session_aggregates,
    )

    ev = load_events(spark, SF_ORACLE).filter(F.col("user_id") < 10).cache()
    path = str(tmp_path / "sess_drops")
    ev.coalesce(1).write.mode("overwrite").parquet(path)
    # sentinel: one event 10 years out for a user outside the cohort
    sentinel = spark.createDataFrame(
        [(999999, 999999, "noop", 0.0, "{}")],
        "event_id long, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.lit("2040-01-01 00:00:00").cast("timestamp"))
    import glob
    import shutil

    tmp2 = str(tmp_path / "sentinel")
    sentinel.select(ev.columns).coalesce(1).write.mode("overwrite").parquet(tmp2)
    for i, f in enumerate(glob.glob(f"{tmp2}/part-*.parquet")):
        shutil.copy(f, f"{path}/zz-sentinel-{i}.parquet")

    out = session_aggregates(read_event_stream(spark, path, max_files=1))
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_events"],
            round(r["sum_value"], 6),
        )
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    batch = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_events"],
            round(r["sum_value"], 6),
        )
        for r in (
            ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
            .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
            .select(
                "user_id",
                F.col("session_window.start").alias("session_start"),
                F.col("session_window.end").alias("session_end"),
                "n_events",
                "sum_value",
            )
        ).collect()
    }
    assert got == batch
    assert len(got) > 10  # real sessions, not a vacuous pass


def test_stream_stream_attribution_join_equals_batch(spark, tmp_path):
    """Stream-stream interval join (clicks x purchases, per-user 24-hour
    attribution; fixture events are hours apart) must produce exactly
    the batch join's matches across micro-batch boundaries."""
    from ai_vector_database_converstion_from_pdf_spark.sources.tables import load_events
    from ai_vector_database_converstion_from_pdf_spark.streaming.ingest_stream import (
        click_purchase_attribution,
        read_event_stream,
    )

    ev = load_events(spark, SF_ORACLE).filter(F.col("user_id") < 15).cache()
    path = str(tmp_path / "attr_drops")
    # two drops split by event id parity -> matches MUST span micro-batches
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("overwrite").parquet(path)
    import glob
    import shutil

    tmp2 = str(tmp_path / "attr2")
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("overwrite").parquet(tmp2)
    for i, f in enumerate(glob.glob(f"{tmp2}/part-*.parquet")):
        shutil.copy(f, f"{path}/zz-second-{i}.parquet")

    stream = read_event_stream(spark, path, max_files=1)
    out = click_purchase_attribution(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
        attribution_window="24 hours",
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("attr_out")
        .option("checkpointLocation", str(tmp_path / "attr_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.sql("SELECT * FROM attr_out").collect()
    }
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("cid"), F.col("ts").alias("cts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("pid"), F.col("ts").alias("pts")
    )
    batch = {
        (r["cid"], r["pid"])
        for r in clicks.join(
            purchases,
            (F.col("u") == F.col("pu"))
            & (F.col("pts") > F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 24 hours")),
        ).collect()
    }
    assert got == batch
    assert len(batch) > 5  # non-vacuous
    # and matches genuinely crossed micro-batch boundaries
    crossing = {(c, p) for c, p in batch if c % 2 != p % 2}
    assert crossing & got


def test_streaming_funnel_matches_batch_and_spans_batches(spark, tmp_path):
    """The streaming DFA must (a) equal the batch regexp count when all
    of a user's history has arrived, and (b) complete a pattern whose
    prefix arrived in an earlier micro-batch (state-store carry)."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from ai_vector_database_converstion_from_pdf_spark.catalog import (
        events_sequence_pattern,
    )
    from ai_vector_database_converstion_from_pdf_spark.sources.tables import (
        load_events,
    )
    from ai_vector_database_converstion_from_pdf_spark.streaming.ingest_stream import (
        read_event_stream,
        streaming_funnel_counts,
    )

    ev = load_events(spark, SF_ORACLE).filter(F.col("user_id") < 30).cache()
    cut = ev.agg(F.expr("percentile_approx(ts, 0.5)")).collect()[0][0]
    path = str(tmp_path / "drops")
    # drop 1 = older half, drop 2 = newer half: per-user in-order arrival
    ev.filter(F.col("ts") <= F.lit(cut)).coalesce(1).write.parquet(path)
    tmp2 = str(tmp_path / "drop2")
    ev.filter(F.col("ts") > F.lit(cut)).coalesce(1).write.parquet(tmp2)
    for i, f in enumerate(glob.glob(f"{tmp2}/part-*.parquet")):
        shutil.copy(f, f"{path}/zz-second-{i}.parquet")

    out = streaming_funnel_counts(read_event_stream(spark, path, max_files=1))
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("funnels")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("SELECT * FROM funnels").collect()
    final = {}
    spanned = 0
    for r in rows:
        final[r["user_id"]] = max(final.get(r["user_id"], 0), r["n_strict"])
    per_user_rows = {}
    for r in rows:
        per_user_rows.setdefault(r["user_id"], []).append(r)
    spanned = sum(
        1
        for rs in per_user_rows.values()
        if len(rs) >= 2 and min(r["batch_matches"] for r in rs) >= 0
    )
    assert spanned > 0

    # write the filtered subset as a fixture dir for the batch entry
    d = tmp_path / "sf"
    ev.write.parquet(str(d / "events.parquet"))
    batch = {
        r["user_id"]: r["n_strict"]
        for r in events_sequence_pattern(spark, str(d)).collect()
    }
    assert final == {u: n for u, n in batch.items()}


def test_streaming_funnel_prefix_carries_across_batches(spark, tmp_path):
    """v,c in drop 1 and p in drop 2 must still count — the automaton
    state (not just totals) survives the micro-batch boundary."""
    import datetime
    import glob
    import shutil

    from ai_vector_database_converstion_from_pdf_spark.streaming.ingest_stream import (
        read_event_stream,
        streaming_funnel_counts,
    )

    UTC = datetime.timezone.utc

    def _df(rows):
        return spark.createDataFrame(
            [
                (
                    eid,
                    datetime.datetime.fromtimestamp(ts, UTC).replace(tzinfo=None),
                    uid,
                    et,
                    0.0,
                    "{}",
                )
                for eid, ts, uid, et in rows
            ],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )

    path = str(tmp_path / "drops")
    _df([(1, 100, 7, "view"), (2, 101, 7, "click")]).coalesce(1).write.parquet(
        path
    )
    tmp2 = str(tmp_path / "drop2")
    _df([(3, 102, 7, "purchase")]).coalesce(1).write.parquet(tmp2)
    for i, f in enumerate(glob.glob(f"{tmp2}/part-*.parquet")):
        shutil.copy(f, f"{path}/zz-second-{i}.parquet")

    out = streaming_funnel_counts(read_event_stream(spark, path, max_files=1))
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("funnel_span")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = sorted(
        spark.sql("SELECT * FROM funnel_span").collect(),
        key=lambda r: r["n_strict"],
    )
    assert [r["n_strict"] for r in rows] == [0, 1]
    assert rows[-1]["batch_matches"] == 1


def test_streaming_attribution_matches_batch(spark, tmp_path):
    """The per-conversion streaming rows, aggregated, must equal the
    batch events_attribution touch matrix — including conversions whose
    touches arrived in an earlier micro-batch (string state carry)."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from ai_vector_database_converstion_from_pdf_spark.catalog import (
        events_attribution,
    )
    from ai_vector_database_converstion_from_pdf_spark.sources.tables import (
        load_events,
    )
    from ai_vector_database_converstion_from_pdf_spark.streaming.ingest_stream import (
        read_event_stream,
        streaming_attribution,
    )

    ev = load_events(spark, SF_ORACLE).filter(F.col("user_id") < 30).cache()
    cut = ev.agg(F.expr("percentile_approx(ts, 0.5)")).collect()[0][0]
    path = str(tmp_path / "drops")
    ev.filter(F.col("ts") <= F.lit(cut)).coalesce(1).write.parquet(path)
    tmp2 = str(tmp_path / "drop2")
    ev.filter(F.col("ts") > F.lit(cut)).coalesce(1).write.parquet(tmp2)
    for i, f in enumerate(glob.glob(f"{tmp2}/part-*.parquet")):
        shutil.copy(f, f"{path}/zz-second-{i}.parquet")

    out = streaming_attribution(read_event_stream(spark, path, max_files=1))
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("attrib")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r["first_touch"], r["last_touch"]): (r["conversions"], r["revenue"])
        for r in spark.sql(
            """SELECT first_touch, last_touch, count(*) AS conversions,
                      round(sum(cast(value AS decimal(18,6))), 6) AS revenue
               FROM attrib GROUP BY 1, 2"""
        ).collect()
    }
    got = {k: (c, float(s)) for k, (c, s) in got.items()}

    d = tmp_path / "sf"
    ev.write.parquet(str(d / "events.parquet"))
    batch = {
        (r["first_touch"], r["last_touch"]): (r["conversions"], r["revenue"])
        for r in events_attribution(spark, str(d)).collect()
    }
    assert got == batch
    assert len(batch) > 3  # non-vacuous matrix


def test_streaming_token_quota_across_batches(spark, tmp_path):
    """Quota state must persist across micro-batches: drop 1 consumes
    part of a source's budget, drop 2 crosses it mid-batch — later docs
    from that source are rejected with admitted=false."""
    import glob
    import shutil

    from ai_vector_database_converstion_from_pdf_spark.streaming.ingest_stream import (
        streaming_token_quota,
    )

    def doc(i, n_tok, src):
        return (i, " ".join(f"t{i}x{j}" for j in range(n_tok)), "en", src, 0)

    schema = (
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    # source s budget 10: drop1 = 4+4 tokens admitted; drop2 = 3 tokens
    # (rejected: would hit 11), then 2 tokens (admitted: 10 exactly).
    # source t: one 11-token doc -> never admitted; a zero-token doc is
    # admitted at no quota cost (ADVICE r6: empty != over-budget).
    drop1 = spark.createDataFrame([doc(1, 4, "s"), doc(2, 4, "s")], schema)
    drop2 = spark.createDataFrame(
        [doc(3, 3, "s"), doc(4, 2, "s"), doc(5, 11, "t"), doc(6, 0, "t")],
        schema,
    )
    path = str(tmp_path / "drops")
    drop1.coalesce(1).write.parquet(path)
    tmp2 = str(tmp_path / "drop2")
    drop2.coalesce(1).write.parquet(tmp2)
    for i, f in enumerate(glob.glob(f"{tmp2}/part-*.parquet")):
        shutil.copy(f, f"{path}/zz-second-{i}.parquet")

    stream = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(path).schema)
        .option("maxFilesPerTrigger", 1)
        .load(path)
    )
    q = (
        streaming_token_quota(stream, budget=10)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("quota")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    rows = {
        r["doc_id"]: (r["admitted"], r["cum_tokens"])
        for r in spark.sql("SELECT * FROM quota").collect()
    }
    assert rows == {
        1: (True, 4),
        2: (True, 8),
        3: (False, 8),   # 8 + 3 > 10 -> rejected, cum unchanged
        4: (True, 10),   # exactly fills the quota
        5: (False, 0),   # over budget on its own
        6: (True, 0),    # zero tokens: admitted, costs nothing
    }
