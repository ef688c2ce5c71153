"""Round-7 operators: training-triplet mining, the per-source corpus
report, and prefix suggestion — hand-built fixtures with independently
computed expectations (the catalog entries are additionally
value-oracled against DuckDB at sf0.01)."""

import pytest
from pyspark.sql import functions as F

from ai_vector_database_converstion_from_pdf_spark.operators.similarity import (
    training_triplets,
)


def test_training_triplets_geometry(spark):
    """Anchor 0: vec 1 is its nearest neighbor (near-dup, still the
    positive), vec 2 the best non-dup (the hard negative), vec 3 far.
    Near-dup exclusion must knock 1 out of the NEGATIVE slot only."""
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.99, 0.14, 0.0]),   # closest — positive
            (2, [0.9, 0.43, 0.0]),    # next — hard negative
            (3, [0.0, 1.0, 0.0]),     # far
        ],
        "vec_id long, embedding array<float>",
    )
    dups = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    rows = training_triplets(emb, dups, [0]).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["q_id"], r["pos_id"], r["neg_id"]) == (0, 1, 2)
    assert r["pos_score"] > r["neg_score"]
    assert r["margin"] == pytest.approx(r["pos_score"] - r["neg_score"], abs=1e-9)


def test_training_triplets_positive_not_reused_as_negative(spark):
    """When the positive is NOT a near-dup it must still be excluded
    from the negative slot (a triplet with pos == neg is useless)."""
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.99, 0.14]),
            (2, [0.9, 0.43]),
        ],
        "vec_id long, embedding array<float>",
    )
    no_dups = spark.createDataFrame([], "id_a long, id_b long")
    r = training_triplets(emb, no_dups, [0]).collect()[0]
    assert r["pos_id"] == 1 and r["neg_id"] == 2
    assert r["margin"] > 0


def test_corpus_source_report_hand_math(spark, tmp_path):
    from ai_vector_database_converstion_from_pdf_spark.catalog import (
        corpus_source_report,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b a", "en", "s1", 5),
            (2, "a b a", "en", "s1", 5),     # exact dup of 1
            (3, "c d e f", "en", "s1", 7),
            (4, "", "en", "s2", 0),          # empty -> quality 0
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["source"]: r
        for r in corpus_source_report(spark, str(tmp_path)).collect()
    }
    s1 = out["s1"]
    assert s1["n_docs"] == 3 and s1["n_unique_texts"] == 2
    assert s1["dup_rate"] == pytest.approx(1 - 2 / 3, abs=1e-6)
    assert s1["total_tokens"] == 10          # 3 + 3 + 4
    # quality: 2/3, 2/3, 4/4 -> mean 7/9
    assert s1["avg_quality"] == pytest.approx(
        round((round(2 / 3, 6) * 2 + 1.0) / 3, 6), abs=1e-6
    )
    s2 = out["s2"]
    assert s2["n_docs"] == 1 and s2["total_tokens"] == 0
    assert s2["avg_quality"] == 0.0


def test_temperature_mixture_upweights_rare_sources(spark):
    """alpha<1 flattens the mixture: the rare source's SHARE of the
    sample must exceed its natural share, the dominant source's must
    shrink (the XLM-R reweighting contract); alpha=1 recovers
    proportional sampling."""
    from ai_vector_database_converstion_from_pdf_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    rows = [(i, "big") for i in range(900)] + [
        (900 + i, "rare") for i in range(100)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string")

    out = temperature_mixture_sample(
        docs, alpha=0.3, total_target=200, strat_col="source"
    )
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # natural shares 0.9/0.1; alpha=0.3 targets ~0.65/0.35
    tot = sum(by_src.values())
    assert by_src["rare"] / tot > 0.2          # well above natural 0.1
    assert by_src["big"] / tot < 0.8           # well below natural 0.9

    # alpha=1: proportional (within hash-bucket noise)
    prop = temperature_mixture_sample(
        docs, alpha=1.0, total_target=200, strat_col="source"
    )
    by_src1 = {
        r["source"]: r["n"]
        for r in prop.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert abs(by_src1["big"] / sum(by_src1.values()) - 0.9) < 0.1

    # deterministic: same call, same rows
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in temperature_mixture_sample(
            docs, alpha=0.3, total_target=200, strat_col="source"
        ).collect()
    )
    assert a == b


def test_suggest_terms_ranking(spark, tmp_path):
    from ai_vector_database_converstion_from_pdf_spark.catalog import (
        q3_suggest_terms,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark sort spark", "en", "s", 10),
            (2, "sort scan", "en", "s", 10),
            (3, "sort table", "en", "s", 10),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    rows = [
        (r["term"], r["df"])
        for r in q3_suggest_terms(spark, str(tmp_path)).collect()
    ]
    # df counts DISTINCT docs (spark appears twice in doc 1 -> df 1);
    # ties rank alphabetically
    assert rows == [("sort", 3), ("scan", 1), ("spark", 1)]
