"""Round-2 curation operators: dup-cluster resolution, deterministic
sampling, Gopher-style quality gating."""

import pyspark.sql.functions as F

from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
    resolve_duplicates,
)
from ai_vector_database_converstion_from_pdf_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
)
from ai_vector_database_converstion_from_pdf_spark.operators.textstats import (
    gopher_flags,
)


def test_resolve_duplicates_chains_and_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id long")
    # chain 1-2-3 (transitive cluster), pair 4-5, nothing for... all in
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    got = {
        r["id"]: (r["canonical_id"], r["is_dup"])
        for r in resolve_duplicates(docs, pairs, id_col="doc_id").collect()
    }
    assert got == {
        1: (1, False), 2: (1, True), 3: (1, True),
        4: (4, False), 5: (4, True),
    }
    keep = sorted(i for i, (_c, d) in got.items() if not d)
    assert keep == [1, 4]


def test_deterministic_sample_partition_invariant(spark):
    docs = spark.createDataFrame([(i, "x") for i in range(2000)], "doc_id long, text string")
    a = sorted(r["doc_id"] for r in deterministic_sample(docs, 0.3).collect())
    b = sorted(
        r["doc_id"]
        for r in deterministic_sample(docs.repartition(17), 0.3).collect()
    )
    assert a == b  # membership is content-stable, not layout-dependent
    assert 0.25 < len(a) / 2000 < 0.35
    # a different salt draws an independent sample of similar size
    c = sorted(r["doc_id"] for r in deterministic_sample(docs, 0.3, salt="v2").collect())
    assert c != a
    assert 0.25 < len(c) / 2000 < 0.35


def test_stratified_rates(spark):
    rows = [(i, "en" if i % 2 == 0 else "fr") for i in range(2000)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(docs, {"en": 0.5, "fr": 0.05}, strat_col="lang")
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert 0.4 < counts["en"] / 1000 < 0.6
    assert counts.get("fr", 0) / 1000 < 0.12
    # unknown strata use default_rate (0.0 -> dropped entirely)
    docs2 = spark.createDataFrame([(1, "zz")], "doc_id long, lang string")
    assert stratified_sample(docs2, {"en": 0.5}, strat_col="lang").count() == 0


def test_gopher_rules(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again today"),
            (2, "too short"),                                   # n_words < 10
            (3, "(((((~~~!!! ??? &&& ***))))) " * 6),           # symbol soup
            (4, " ".join(["pneumonoultramicroscopic"] * 20)),   # mean_wlen > 10
            (5, " ".join(f"w{i}" for i in range(30))),          # no stopwords
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in gopher_flags(docs).collect()}
    assert got[1]["keep"]
    assert not got[2]["keep"] and not got[2]["keep_words"]
    assert not got[3]["keep"] and not got[3]["keep_punct"]
    assert not got[4]["keep"] and not got[4]["keep_wlen"]
    assert not got[5]["keep"] and not got[5]["keep_stop"]


def test_curate_corpus_flags_consistent(spark):
    """The composed pipeline's flags must agree with the stage operators
    run standalone, and `keep` must imply every stage flag."""
    from ai_vector_database_converstion_from_pdf_spark.operators.textstats import gopher_flags
    from ai_vector_database_converstion_from_pdf_spark.plans.curate import curate_corpus
    from tests.conftest import SF_ORACLE

    from pyspark.sql import functions as F

    # plant PII exactly as the catalog entry does — the fixture text has
    # none, and a vacuous scrub stage would pass even if broken
    d = F.col("doc_id")
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact agent"), d.cast("string"),
            F.lit("@corp"), d.cast("string"),
            F.lit(".example or 555-867-"), (d % 9000 + 1000).cast("string"),
            F.lit(" ssn "), (d % 900 + 100).cast("string"),
            F.lit("-45-6789 host 10."), (d % 256).cast("string"),
            F.lit(".0."), (d % 100).cast("string"),
        ),
    )
    audit = curate_corpus(docs).cache()
    rows = audit.collect()
    assert len(rows) == docs.count()
    # scrub is exercised on every row: all four marker types present,
    # and no raw PII pattern survives
    for r in rows[:20]:
        for marker in ("<EMAIL>", "<PHONE>", "<SSN>", "<IP>"):
            assert marker in r["redacted"], (r["doc_id"], marker)
    # the pipeline still keeps a non-degenerate training set
    assert sum(1 for r in rows if r["keep"]) > 100
    for r in rows:
        if r["keep"]:
            assert (
                r["dedup_keep"] and r["quality_keep"] and r["repetition_keep"]
                and r["decon_keep"] and not r["is_eval"]
            )
    standalone_quality = {
        r["doc_id"]: r["keep"] for r in gopher_flags(docs).collect()
    }
    for r in rows:
        assert r["quality_keep"] == standalone_quality[r["doc_id"]]
    # PII patterns never survive in redacted text
    leaked = audit.filter(
        F.col("redacted").rlike(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
        | F.col("redacted").rlike(r"\b\d{3}-\d{2}-\d{4}\b")
        | F.col("redacted").rlike(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b")
    ).count()
    assert leaked == 0
    audit.unpersist()
