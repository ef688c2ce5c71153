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


def test_prefix_search_modes(spark):
    """`tok*` matches any token with the prefix; bare terms exact; a doc
    with many prefix hits still scores 1 per query term (VERDICT r2
    missing #1)."""
    from ai_vector_database_converstion_from_pdf_spark.operators.keyword import (
        prefix_search,
    )

    df = spark.createDataFrame(
        [
            (1, "merge merged merging table"),   # merg* (x3 -> 1) + table
            (2, "merchant table"),               # no merg*, exact table
            (3, "merge only"),                   # merg* only
            (4, "nothing relevant"),
        ],
        "id long, text string",
    )
    got = {
        r["id"]: r["match_cnt"]
        for r in prefix_search(df, "merg* table", 10).collect()
    }
    assert got == {1: 2, 2: 1, 3: 1}
    # probing a materialized fts_index gives identical results
    idx = build_fts_index(df)
    via_idx = {
        r["id"]: r["match_cnt"]
        for r in prefix_search(df, "merg* table", 10, fts_index=idx).collect()
    }
    assert via_idx == got


def test_near_search_window(spark):
    """NEAR(a b, n): terms within n intervening tokens match; farther
    apart does not (VERDICT r2 missing #1)."""
    from ai_vector_database_converstion_from_pdf_spark.operators.keyword import (
        near_search,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha x beta"),                    # 1 intervening
            (2, "alpha x y z beta"),                # 3 intervening
            (3, "beta q alpha"),                    # order-free, 1 intervening
            (4, "alpha only here"),
            (5, "alpha x y beta z alpha"),          # two windows
        ],
        "id long, text string",
    )
    got = {r["id"]: r["near_cnt"] for r in near_search(df, "alpha beta", 10, n=2).collect()}
    assert set(got) == {1, 3, 5}
    assert got[1] >= 1 and got[3] >= 1
    wide = {r["id"] for r in near_search(df, "alpha beta", 10, n=3).collect()}
    assert wide == {1, 2, 3, 5}


def test_boolean_search_groups(spark):
    """`a AND b OR c NOT d`: OR-of-AND-groups with NOT exclusion."""
    from ai_vector_database_converstion_from_pdf_spark.operators.keyword import (
        boolean_search,
    )

    df = spark.createDataFrame(
        [
            (1, "merge sort join"),       # group1 (merge+sort)
            (2, "dup rows here"),         # group2 (dup, no vector)
            (3, "dup vector rows"),       # group2 blocked by NOT vector
            (4, "merge only"),            # neither
            (5, "merge sort dup"),        # both groups -> hit_groups 2
        ],
        "id long, text string",
    )
    got = {
        r["id"]: r["hit_groups"]
        for r in boolean_search(
            df, "merge AND sort OR dup NOT vector", 10
        ).collect()
    }
    assert got == {1: 1, 2: 1, 5: 2}


def test_match_search_dispatch(spark):
    """The FTS5 MATCH front door routes each syntax to its engine the
    way FTS5 parses the raw string (vector_store.cpp:251-262)."""
    from ai_vector_database_converstion_from_pdf_spark.operators.keyword import (
        match_search,
    )

    df = spark.createDataFrame(
        [
            (1, "fast table scan"),
            (2, "table x y fast"),
            (3, "merge sorted data"),
            (4, "fast vector table"),
        ],
        "id long, text string",
    )

    # quoted -> phrase (adjacent only)
    assert [r["id"] for r in match_search(df, '"fast table"', 10).collect()] == [1]
    # NEAR -> windowed
    near_ids = {r["id"] for r in match_search(df, "NEAR(fast table, 2)", 10).collect()}
    assert near_ids == {1, 2, 4}
    # boolean keywords
    bool_ids = {
        r["id"]
        for r in match_search(df, "fast AND table NOT vector", 10).collect()
    }
    assert bool_ids == {1, 2}
    # star -> prefix
    pref = {r["id"]: r["match_cnt"] for r in match_search(df, "sort*", 10).collect()}
    assert pref == {3: 1}
    # plain -> OR-of-terms
    plain = {r["id"] for r in match_search(df, "fast merge", 10).collect()}
    assert plain == {1, 2, 3, 4}


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


def test_fts_modes_cross_consistency(spark):
    """The MATCH family is internally consistent on real fixture data:
    degenerate forms of each mode collapse to the simpler mode."""
    from tests.conftest import SF_ORACLE
    from ai_vector_database_converstion_from_pdf_spark.operators.keyword import (
        boolean_search,
        near_search,
        prefix_search,
    )

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").limit(200)
    kw = keyword_search(docs, "merge", 1000, id_col="doc_id", text_col="text")
    kw_ids = {r["id"] for r in kw.collect()}

    # boolean with ONE positive term == plain term match
    b_ids = {
        r["id"]
        for r in boolean_search(docs, "merge", 1000, id_col="doc_id",
                                text_col="text").collect()
    }
    assert b_ids == kw_ids

    # prefix query with no star == exact term match (counts too)
    p = {
        (r["id"], r["match_cnt"])
        for r in prefix_search(docs, "merge", 1000, id_col="doc_id",
                               text_col="text").collect()
    }
    assert p == {(r["id"], r["match_cnt"]) for r in kw.collect()}

    # NEAR with an unbounded window == boolean AND of the terms
    both = {
        r["id"]
        for r in boolean_search(docs, "merge AND sort", 1000, id_col="doc_id",
                                text_col="text").collect()
    }
    wide = {
        r["id"]
        for r in near_search(docs, "merge sort", 1000, n=10_000,
                             id_col="doc_id", text_col="text").collect()
    }
    assert wide == both
