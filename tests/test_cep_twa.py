"""Hand-computed semantics for the CEP sequence-pattern and
time-weighted-average catalog entries (tests/test_catalog_oracle.py
covers their DuckDB parity; these pin the math independently)."""

import datetime

from pyspark.sql import functions as F

from ai_vector_database_converstion_from_pdf_spark.catalog import (
    events_sequence_pattern,
    events_time_weighted_avg,
)

UTC = datetime.timezone.utc


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (
                eid,
                datetime.datetime.fromtimestamp(ts, UTC).replace(tzinfo=None),
                uid,
                et,
                float(v),
                "{}",
            )
            for eid, ts, uid, et, v in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


class TestSequencePattern:
    def test_strict_and_relaxed_counts(self, spark, tmp_path):
        # user 1: v c c p v p  -> strict: vccp (1); relaxed: vccp, vp (2)
        # user 2: v e c p      -> strict: 0 (error breaks adjacency);
        #                         relaxed: vecp (1)
        # user 3: p c v        -> 0 / 0 (purchase precedes the view)
        rows = [
            (1, 100, 1, "view", 0),
            (2, 101, 1, "click", 0),
            (3, 102, 1, "click", 0),
            (4, 103, 1, "purchase", 0),
            (5, 104, 1, "view", 0),
            (6, 105, 1, "purchase", 0),
            (7, 100, 2, "view", 0),
            (8, 101, 2, "error", 0),
            (9, 102, 2, "click", 0),
            (10, 103, 2, "purchase", 0),
            (11, 100, 3, "purchase", 0),
            (12, 101, 3, "click", 0),
            (13, 102, 3, "view", 0),
        ]
        d = tmp_path / "sf"
        _events(spark, rows).write.parquet(str(d / "events.parquet"))
        out = {
            r["user_id"]: (r["seq_len"], r["n_strict"], r["n_relaxed"])
            for r in events_sequence_pattern(spark, str(d)).collect()
        }
        assert out == {1: (6, 1, 2), 2: (4, 0, 1), 3: (3, 0, 0)}

    def test_tie_broken_by_event_id(self, spark, tmp_path):
        # same timestamp: event_id order decides v-before-p vs p-before-v
        rows = [
            (1, 100, 1, "view", 0),
            (2, 100, 1, "purchase", 0),
            (2, 100, 2, "view", 0),
            (1, 100, 2, "purchase", 0),
        ]
        d = tmp_path / "sf"
        _events(spark, rows).write.parquet(str(d / "events.parquet"))
        out = {
            r["user_id"]: r["n_relaxed"]
            for r in events_sequence_pattern(spark, str(d)).collect()
        }
        assert out == {1: 1, 2: 0}


class TestTimeWeightedAvg:
    def test_trapezoid_math(self, spark, tmp_path):
        # user 1: value 0 for 10s then jumps to 10 for the last 10s of a
        # 20s span sampled at t=0,10,20 with values 0,0 ... wait — use
        # 0@0, 10@10, 10@20: trapezoids (0+10)/2*10 + (10+10)/2*10
        # = 50 + 100 = 150 over 20s -> 7.5
        rows = [
            (1, 100, 1, "view", 0.0),
            (2, 110, 1, "view", 10.0),
            (3, 120, 1, "view", 10.0),
        ]
        d = tmp_path / "sf"
        _events(spark, rows).write.parquet(str(d / "events.parquet"))
        out = events_time_weighted_avg(spark, str(d)).collect()
        assert len(out) == 1
        assert out[0]["twa_value"] == 7.5

    def test_single_event_user_excluded_and_burst_downweighted(
        self, spark, tmp_path
    ):
        # user 2 has one event (zero span) -> excluded; user 1's brief
        # spike to 100 between long flat-0 stretches stays far below
        # the naive mean
        rows = [
            (1, 0, 1, "view", 0.0),
            (2, 1000, 1, "view", 0.0),
            (3, 1001, 1, "view", 100.0),
            (4, 1002, 1, "view", 0.0),
            (5, 2000, 1, "view", 0.0),
            (6, 500, 2, "view", 5.0),
        ]
        d = tmp_path / "sf"
        _events(spark, rows).write.parquet(str(d / "events.parquet"))
        out = {
            r["user_id"]: r["twa_value"]
            for r in events_time_weighted_avg(spark, str(d)).collect()
        }
        assert set(out) == {1}
        # exact trapezoids: (0+100)/2*1 + (100+0)/2*1 = 100 over 2000s
        assert out[0 + 1] == 0.05

    def test_layout_invariance(self, spark, tmp_path):
        sf = "/root/testdata/sf0.001"
        a = [tuple(r) for r in events_time_weighted_avg(spark, sf).collect()]
        # same rows, different file layout
        d = tmp_path / "sf"
        spark.read.parquet(f"{sf}/events.parquet").repartition(7).write.parquet(
            str(d / "events.parquet")
        )
        b = [tuple(r) for r in events_time_weighted_avg(spark, str(d)).collect()]
        assert a == b
