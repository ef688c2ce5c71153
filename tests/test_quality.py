"""Data-quality checks must FIRE on planted violations (the oracle entry
only proves zeros on healthy fixtures)."""

from pyspark.sql import functions as F


def test_quality_checks_fire_on_planted_violations(spark):
    from ai_vector_database_converstion_from_pdf_spark.operators.quality import (
        quality_report,
    )

    orders = spark.createDataFrame(
        [(1, "O"), (1, "F"), (2, "XX"), (3, "P")],  # dup PK + bad status
        "o_orderkey long, o_orderstatus string",
    )
    # orderkeys 99/98 are orphans; discounts 1.5 and -0.1 out of range
    lineitem = spark.createDataFrame(
        [(1, 0.05), (99, 0.5), (98, 1.5), (2, -0.1)],
        "l_orderkey long, l_discount double",
    )
    documents = spark.createDataFrame(
        [(1, "ok"), (2, None)], "doc_id long, text string"
    )
    events = spark.createDataFrame(
        [(1,), (2,)], "event_id long"
    ).select(
        "event_id",
        F.when(F.col("event_id") == 1, F.lit("2024-01-15 00:00:00"))
        .otherwise(F.lit("2025-06-01 00:00:00"))
        .cast("timestamp")
        .alias("ts"),
    )
    got = {
        r["check"]: r["n_violations"]
        for r in quality_report(spark, orders, lineitem, documents, events).collect()
    }
    assert got["unique_pk"] == 1          # orderkey 1 twice
    assert got["not_null_text"] == 1
    assert got["accepted_values_status"] == 1   # 'XX'
    assert got["range_discount"] == 2     # 1.5 and -0.1
    assert got["fk_lineitem_orders"] == 2  # 99, 98
    assert got["ts_domain"] == 1          # the 2025 event


def test_embedding_quality_detects_planted_defects(spark):
    """Plant every defect class the vector QA reports and check counts:
    a NULL vector, a NaN component, an off-dimension vector, a zero
    vector — each flagged exactly once; clean rows set the norm stats."""
    from ai_vector_database_converstion_from_pdf_spark.operators.quality import (
        embedding_quality,
    )

    rows = [
        (1, [3.0, 4.0]),          # norm 5
        (2, [0.6, 0.8]),          # norm 1
        (3, None),                # null
        (4, [float("nan"), 1.0]), # nan
        (5, [1.0, 2.0, 2.0]),     # off-dim (modal dim = 2)
        (6, [0.0, 0.0]),          # zero norm
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["metric"]: r["value"] for r in embedding_quality(emb).collect()}
    assert got["n_vectors"] == 6.0
    assert got["n_null"] == 1.0
    assert got["n_nan"] == 1.0
    assert got["n_offdim"] == 1.0
    assert got["n_zero_norm"] == 1.0
    # norms: [5, 1, nan-propagated?, 3, 0] — NaN rows poison avg; the
    # report's job is the counts, but p50 must be finite over the rest
    assert got["norm_p50"] is not None


def test_adaptive_quality_gate_hand_math(spark):
    """Per-source p10/p50 gate vs an independent pure-Python
    recomputation of both the quality formula and the interpolated
    percentile — plus the adaptive point itself: the same mediocre text
    is DROPPED in a strong source but KEPT in a weak one."""
    import re

    import numpy as np

    from ai_vector_database_converstion_from_pdf_spark.operators.textstats import (
        STOPWORDS,
        adaptive_quality_gate,
    )

    def ref_quality(text: str) -> float:
        n = len(text)
        ts = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        len_term = 0.0 if n <= 0 else min(n / 200.0, 1.0) * (0.5 if n > 4000 else 1.0)
        p = 0.0 if n == 0 else (n - len(re.sub(r"[^a-zA-Z0-9\s]", "", text))) / n
        punct_term = max(0.0, 1.0 - p * 4.0)
        sw = 0.0 if not ts else sum(t in STOPWORDS for t in ts) / len(ts)
        sw_term = 1.0 if 0.05 <= sw <= 0.6 else 0.5
        mwl = 0.0 if not ts else sum(len(t) for t in ts) / len(ts)
        mwl_term = 1.0 if 3.0 <= mwl <= 8.0 else 0.5
        return round(
            0.4 * len_term + 0.2 * punct_term + 0.2 * sw_term + 0.2 * mwl_term, 6
        )

    strong = "the quick brown fox jumps over the lazy dog and keeps running "
    rows = [
        # strong source: three long clean docs + one mediocre short one
        (1, "a", strong * 4),
        (2, "a", strong * 4 + "with more and more flowing text here"),
        (3, "a", strong * 3),
        (4, "a", "short mediocre text here"),
        # weak source: all mediocre — the same short text now clears
        # its own source's cut
        (5, "b", "short mediocre text here"),
        (6, "b", "short!! mediocre?? text... here##"),
        (7, "b", "x y z q"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r["doc_id"]: r
        for r in adaptive_quality_gate(docs, frac=0.5).collect()
    }
    by_src: dict[str, list[float]] = {}
    for _id, src, text in rows:
        by_src.setdefault(src, []).append(ref_quality(text))
    for _id, src, text in rows:
        q = ref_quality(text)
        cut = round(float(np.percentile(by_src[src], 50, method="linear")), 6)
        assert out[_id]["quality"] == q, (_id, out[_id]["quality"], q)
        assert out[_id]["src_cut"] == cut, (_id, out[_id]["src_cut"], cut)
        assert out[_id]["keep"] == (q >= cut)
    # the adaptive point: identical text, opposite outcomes
    assert not out[4]["keep"]  # below the strong source's median
    assert out[5]["keep"]      # at/above the weak source's median
