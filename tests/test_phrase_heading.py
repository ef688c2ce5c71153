"""FTS5 MATCH parity additions (VERDICT r1 #7): phrase adjacency and the
heading-augmented index probe in the flagship plan."""

import pyspark.sql.functions as F

from ai_vector_database_converstion_from_pdf_spark.operators.keyword import (
    build_fts_index,
    keyword_search,
    phrase_search,
)


def test_phrase_adjacency_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "slow fast table value fast table end"),
            (2, "fast slow table"),
            (3, "fast table"),
            (4, "table fast"),
            (5, "Fast, table! (fast) table"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["phrase_cnt"] for r in phrase_search(df, "fast table", 10).collect()}
    # punctuation splits tokens, so doc 5 has two adjacent pairs
    assert got == {1: 2, 3: 1, 5: 2}


def test_phrase_repeated_term(spark):
    df = spark.createDataFrame(
        [(1, "ring ring ring"), (2, "ring a ring")], "id long, text string"
    )
    got = {r["id"]: r["phrase_cnt"] for r in phrase_search(df, "ring ring", 10).collect()}
    assert got == {1: 2}


def test_heading_tokens_match_via_fts_index(spark):
    docs = spark.createDataFrame(
        [
            (1, "the body talks about apples", "Quarterly Revenue"),
            (2, "the body talks about oranges", "Appendix"),
        ],
        "id long, text string, heading_path string",
    )
    idx = build_fts_index(docs, heading_col="heading_path")
    # 'revenue' appears ONLY in doc 1's heading
    hits = keyword_search(docs, "revenue", 10, fts_index=idx).collect()
    assert [r["id"] for r in hits] == [1]
    # without the index the heading token cannot match
    assert keyword_search(docs, "revenue", 10).count() == 0


def test_engine_search_matches_heading_token(spark, tmp_path):
    """Flagship path: a chunk whose HEADING carries the query term is
    retrievable (vector_store.cpp:195-200)."""
    from ai_vector_database_converstion_from_pdf_spark.engine import PvdbEngine
    from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace

    eng = PvdbEngine(spark, str(tmp_path / "hws"), dim=16, asof="2024-06-01 00:00:00")
    eng.index_documents(
        spark.createDataFrame(
            [(i, f"body text number {i}") for i in range(8)],
            "doc_id long, text string",
        )
    )
    # overwrite one chunk's heading_path out-of-band, then search its token
    ws: Workspace = eng.workspace
    chunks = ws.chunks(fold_boosts=False)
    updated = chunks.withColumn(
        "heading_path",
        F.when(F.col("id") == 3, F.lit("Zygote Protocol")).otherwise(
            F.col("heading_path")
        ),
    )
    ws._overwrite("chunks", updated)
    eng.cache.clear()
    res = eng.search("zygote", k=3)
    assert res
    assert res[0]["id"] == 3
