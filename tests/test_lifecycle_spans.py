"""Unit tests for the round-3 additions: growth accounting, gap-fill,
gaps-and-islands, and substring-level duplicate-span detection.

The DuckDB-oracle equivalence for each entry is covered by
tools/verify_local.py / the driver gate; these tests pin the *semantics*
on tiny hand-built frames where the expected answer is computable by
hand, plus plan-shape assertions for the scale contract.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from ai_vector_database_converstion_from_pdf_spark.operators.dedup import duplicate_spans


SF = "/root/testdata/sf0.01"


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour, 0, 0)


# ---------------------------------------------------------------------------
# events_user_lifecycle
# ---------------------------------------------------------------------------


def test_lifecycle_classification_by_hand(spark):
    from ai_vector_database_converstion_from_pdf_spark import catalog

    ev = spark.createDataFrame(
        [
            # user 1: day 1 (new), day 2 (retained), day 5 (resurrected)
            Row(event_id=1, ts=_ts(1), user_id=1, event_type="view", value=1.0, props="{}"),
            Row(event_id=2, ts=_ts(1, 8), user_id=1, event_type="view", value=1.0, props="{}"),
            Row(event_id=3, ts=_ts(2), user_id=1, event_type="view", value=1.0, props="{}"),
            Row(event_id=4, ts=_ts(5), user_id=1, event_type="view", value=1.0, props="{}"),
            # user 2: day 2 only (new)
            Row(event_id=5, ts=_ts(2), user_id=2, event_type="view", value=1.0, props="{}"),
        ]
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(os.path.join(d, "events.parquet"))
        out = catalog._QUERIES["events_user_lifecycle"](spark, d).collect()
    got = {(r["day_epoch"], r["status"]): r["n_users"] for r in out}
    day1 = int(_ts(1).replace(tzinfo=dt.timezone.utc).timestamp())
    day2 = day1 + 86400
    day5 = day1 + 4 * 86400
    assert got == {
        (day1, "new"): 1,
        (day2, "new"): 1,
        (day2, "retained"): 1,
        (day5, "resurrected"): 1,
    }


# ---------------------------------------------------------------------------
# events_gapfill_daily
# ---------------------------------------------------------------------------


def test_gapfill_dense_spine_and_forward_fill(spark):
    from ai_vector_database_converstion_from_pdf_spark import catalog

    ev = spark.createDataFrame(
        [
            Row(event_id=1, ts=_ts(1), user_id=7, event_type="view", value=2.5, props="{}"),
            Row(event_id=2, ts=_ts(1, 9), user_id=7, event_type="view", value=1.5, props="{}"),
            # gap: days 2-3 missing
            Row(event_id=3, ts=_ts(4), user_id=7, event_type="view", value=10.0, props="{}"),
        ]
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(os.path.join(d, "events.parquet"))
        rows = catalog._QUERIES["events_gapfill_daily"](spark, d).collect()
    assert len(rows) == 4  # dense daily spine over [day1, day4]
    vals = [(r["value_filled"], r["is_observed"]) for r in rows]
    assert vals == [(4.0, True), (4.0, False), (4.0, False), (10.0, True)]
    epochs = [r["day_epoch"] for r in rows]
    assert epochs == sorted(epochs)
    assert epochs[1] - epochs[0] == 86400


def test_gapfill_row_count_matches_user_spans(spark):
    """On the real fixture: rows == sum over users of (span_days)."""
    from ai_vector_database_converstion_from_pdf_spark import catalog

    out = catalog._QUERIES["events_gapfill_daily"](spark, SF)
    n = out.count()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    spans = (
        ev.groupBy("user_id")
        .agg(
            (
                (
                    F.date_trunc("day", F.max("ts")).cast("double")
                    - F.date_trunc("day", F.min("ts")).cast("double")
                )
                / 86400.0
                + 1
            ).alias("days")
        )
        .agg(F.sum("days"))
        .collect()[0][0]
    )
    assert n == int(spans)


# ---------------------------------------------------------------------------
# orders_priority_islands
# ---------------------------------------------------------------------------


def test_islands_collapse_consecutive_runs(spark):
    from ai_vector_database_converstion_from_pdf_spark import catalog

    o = spark.createDataFrame(
        [
            Row(o_orderkey=1, o_custkey=1, o_orderstatus="O", o_totalprice=1.0,
                o_orderdate=_ts(1), o_orderpriority="1-URGENT"),
            Row(o_orderkey=2, o_custkey=1, o_orderstatus="O", o_totalprice=1.0,
                o_orderdate=_ts(2), o_orderpriority="1-URGENT"),
            Row(o_orderkey=3, o_custkey=1, o_orderstatus="O", o_totalprice=1.0,
                o_orderdate=_ts(3), o_orderpriority="5-LOW"),
            Row(o_orderkey=4, o_custkey=1, o_orderstatus="O", o_totalprice=1.0,
                o_orderdate=_ts(4), o_orderpriority="1-URGENT"),
        ]
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        o.write.parquet(os.path.join(d, "orders.parquet"))
        rows = catalog._QUERIES["orders_priority_islands"](spark, d).collect()
    # runs: [URGENT x2], [LOW], [URGENT] — 3 islands, NOT merged across the gap
    assert [(r["island"], r["priority"], r["n_orders"]) for r in rows] == [
        (1, "1-URGENT", 2),
        (2, "5-LOW", 1),
        (3, "1-URGENT", 1),
    ]
    assert rows[0]["valid_to_epoch"] - rows[0]["valid_from_epoch"] == 86400


def test_islands_single_sort_plan(spark):
    """Scale contract: lag + running-sum share ONE partitioned sort —
    exactly one exchange on o_custkey feeds both windows."""
    from ai_vector_database_converstion_from_pdf_spark import catalog

    plan = catalog._QUERIES["orders_priority_islands"](spark, SF)._jdf.queryExecution().executedPlan().toString()
    # two window operators, but only one hashpartitioning(o_custkey) exchange
    assert plan.count("Window") >= 2
    import re

    cust_exchanges = re.findall(r"hashpartitioning\(o_custkey", plan)
    assert len(cust_exchanges) == 1


# ---------------------------------------------------------------------------
# duplicate_spans
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t)) for i, t in rows]
    )


def test_duplicate_spans_detects_shared_passage(spark):
    boiler = "All rights reserved under the international copyright conventions of 2024!"
    docs = _docs(
        spark,
        [
            (1, "unique prefix one. " + boiler),
            (2, "totally different start text " + boiler),
            (3, "no shared content here at all, this text stands alone entirely."),
        ],
    )
    out = duplicate_spans(docs, span_len=20, stride=10).collect()
    assert len(out) > 0
    for r in out:
        assert r["n_docs"] == 2
        assert {r["min_doc_id"], r["max_doc_id"]} == {1, 2}


def test_duplicate_spans_no_false_positives(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo"),
            (2, "zulu yankee xray whiskey victor uniform tango sierra romeo quebec pa"),
        ],
    )
    assert duplicate_spans(docs, span_len=20, stride=10).count() == 0


def test_duplicate_spans_within_doc_repeat_not_flagged_alone(spark):
    """A passage repeated only WITHIN one doc does not meet min_docs=2."""
    rep = "repeated internal block 123456789 abcdefghij"
    docs = _docs(spark, [(1, rep + " filler middle " + rep)])
    assert duplicate_spans(docs, span_len=20, stride=10).count() == 0


def test_duplicate_spans_short_docs_skipped(spark):
    docs = _docs(spark, [(1, "tiny"), (2, "tiny")])
    # below span_len: no shingles at all, no error
    assert duplicate_spans(docs, span_len=60, stride=30).count() == 0


def test_duplicate_spans_map_only_shingling_plan(spark):
    """Scale contract: no pairwise join anywhere, and the only shuffles
    are the two aggregate exchanges the exact distinct-doc count needs
    ((span_hash, id) partial-distinct + final span_hash agg); the
    shingling explode itself must not shuffle."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = duplicate_spans(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 2
