"""Watermarked event-time streaming (VERDICT r8 #4, SURVEY §2.8 depth).

Proves the three load-bearing properties of the watermark contract on
constructed micro-batches, then fixture-replay batch parity:

1. a LATE row arriving while its window is still open (window_end >
   current watermark) is merged into the window's final emission;
2. a TOO-LATE row (window_end <= watermark at arrival) is dropped and
   the already-emitted window is never revised;
3. replaying the events fixture through the streaming job reproduces
   the batch `events_tumbling_window` answer exactly on the
   finalized-window subset (window_end <= max(ts) - watermark delay).

Micro-batch boundaries are driven by single-file parquet drops with
maxFilesPerTrigger=1; watermark advancement uses the previous batch's
max event time (Spark semantics), which the scenarios below account
for explicitly.
"""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from ai_vector_database_converstion_from_pdf_spark.streaming.ingest_stream import (
    EVENT_SCHEMA,
    run_windowed_counts_job,
    stage_event_drops,
    windowed_counts_epoch,
)

SF_ORACLE = "/root/testdata/sf0.001"


def _ev(i, minute, second=0, etype="click", value=1.0):
    ts = dt.datetime(2024, 1, 1, 10, 0, 0) + dt.timedelta(
        minutes=minute, seconds=second
    )
    return (i, ts, i % 5, etype, value, "{}")


def _write_drop(spark, tmp_path, name, rows, order):
    """One single-file parquet drop, mtime-sequenced for replay order."""
    stage = str(tmp_path / f"_stage_{name}")
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    src = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    stream_dir = str(tmp_path / "stream_in")
    os.makedirs(stream_dir, exist_ok=True)
    dst = os.path.join(stream_dir, f"drop-{order:03d}.parquet")
    shutil.move(src, dst)
    shutil.rmtree(stage)
    base = 1_700_000_000
    os.utime(dst, (base + order, base + order))
    return stream_dir


class TestLateDataSemantics:
    """5-minute tumbling windows, 10-minute watermark. Window A =
    [10:00, 10:05). Watermark after a batch = that batch's max ts - 10m,
    applied at the START of the next batch."""

    def _run(self, spark, tmp_path):
        return run_windowed_counts_job(
            spark,
            str(tmp_path / "stream_in"),
            str(tmp_path / "ckpt"),
            window="5 minutes",
            watermark="10 minutes",
        )

    def test_late_row_inside_watermark_is_counted(self, spark, tmp_path):
        # batch 1: 3 on-time rows in window A; max ts 10:04 -> wm 9:54
        _write_drop(
            spark, tmp_path, "b1", [_ev(1, 0), _ev(2, 2), _ev(3, 4)], 1
        )
        # batch 2: advance max ts to 10:14 (wm -> 10:04, window A still
        # open since 10:05 > 10:04) PLUS a late row at 10:01 — late by
        # 13 minutes of arrival order but inside the watermark
        _write_drop(spark, tmp_path, "b2", [_ev(4, 14), _ev(5, 1)], 2)
        # batch 3: 10:16 -> wm 10:06 >= 10:05 closes window A
        _write_drop(spark, tmp_path, "b3", [_ev(6, 16)], 3)
        got = {
            r["window_start_epoch"]: r["n"] for r in self._run(spark, tmp_path)
        }
        win_a = int(dt.datetime(2024, 1, 1, 10, 0, tzinfo=dt.timezone.utc).timestamp())
        # the late row (event 5) made it in: 4, not 3
        assert got[win_a] == 4

    def test_too_late_row_is_dropped_and_window_not_revised(
        self, spark, tmp_path
    ):
        """Spark keeps TWO watermarks per micro-batch: late-record
        FILTERING uses the previous batch's watermark, state EVICTION
        the current one. A too-late row landing in the very batch where
        its window closes would therefore still be merged (filter wm
        lags one batch) — so the scenario needs a SPACER batch between
        the watermark-advancing drop and the too-late arrival."""
        # batch 1: 2 rows in window A, max 10:03 -> wm 9:53
        _write_drop(spark, tmp_path, "b1", [_ev(1, 0), _ev(2, 3)], 1)
        # batch 2: 10:20 -> wm 10:10 (effective from batch 3 on)
        _write_drop(spark, tmp_path, "b2", [_ev(3, 20)], 2)
        # batch 3 (SPACER): eviction wm is now 10:10 >= 10:05, so
        # window A emits here at n=2; filter wm catches up to 10:10
        _write_drop(spark, tmp_path, "b3", [_ev(4, 21)], 3)
        # batch 4: a row back in window A arriving when the FILTER
        # watermark is 10:10 > window end 10:05 -> MUST be dropped;
        # plus 10:40 to keep advancing and flush everything else
        _write_drop(spark, tmp_path, "b4", [_ev(5, 2), _ev(6, 40)], 4)
        rows = self._run(spark, tmp_path)
        win_a = int(dt.datetime(2024, 1, 1, 10, 0, tzinfo=dt.timezone.utc).timestamp())
        emits_a = [r for r in rows if r["window_start_epoch"] == win_a]
        # exactly one emission, count 2 — the too-late row neither
        # re-emits nor revises
        assert len(emits_a) == 1 and emits_a[0]["n"] == 2

    def test_each_window_emits_exactly_once(self, spark, tmp_path):
        _write_drop(
            spark, tmp_path, "b1", [_ev(1, 0), _ev(2, 6), _ev(3, 12)], 1
        )
        _write_drop(spark, tmp_path, "b2", [_ev(4, 30)], 2)
        _write_drop(spark, tmp_path, "b3", [_ev(5, 60)], 3)
        rows = self._run(spark, tmp_path)
        keys = [(r["window_start_epoch"], r["event_type"]) for r in rows]
        assert len(keys) == len(set(keys)) and len(keys) >= 3


class TestFixtureReplayBatchParity:
    def test_streamed_finalized_windows_match_batch(self, spark, tmp_path):
        from ai_vector_database_converstion_from_pdf_spark.sources.tables import (
            load_events,
        )

        ev = load_events(spark, SF_ORACLE)
        stream_dir = str(tmp_path / "replay_in")
        stage_event_drops(ev, stream_dir, n_drops=4, flush_drop=True)
        got_rows = run_windowed_counts_job(
            spark, stream_dir, str(tmp_path / "ckpt")
        )
        got = {
            (r["window_start_epoch"], r["event_type"]): (r["n"], r["sum_value"])
            for r in got_rows
        }
        # batch answer restricted to finalized windows: the empty flush
        # drop makes the final watermark exactly max(ts) - 10min
        max_ts = ev.agg(F.max(F.col("ts").cast("long"))).first()[0]
        final_wm = max_ts - 600
        win = (F.floor(F.col("ts").cast("double") / 300) * 300).cast("long")
        batch = (
            ev.groupBy(win.alias("w"), "event_type")
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum(F.col("value").cast("decimal(18,6)"))
                .cast("double")
                .alias("sum_value"),
            )
            .filter(F.col("w") + 300 <= final_wm)
        )
        exp = {
            (r["w"], r["event_type"]): (r["n"], r["sum_value"])
            for r in batch.collect()
        }
        assert got == exp and len(exp) > 10
