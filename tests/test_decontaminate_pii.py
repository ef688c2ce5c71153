"""Decontamination (n-gram collision) and PII redaction unit tests."""

from pyspark.sql import functions as F

from ai_vector_database_converstion_from_pdf_spark.operators.decontaminate import (
    contaminated_ids,
    ngram_contamination,
)
from ai_vector_database_converstion_from_pdf_spark.operators.textstats import redact_pii


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


EVAL_SENT = "the quick brown fox jumps over the lazy dog near the river bank today"


def test_contamination_flags_copied_span(spark):
    train = _docs(
        spark,
        [
            # doc 1 embeds the eval sentence verbatim -> many 13-gram hits
            (1, f"some filler text then {EVAL_SENT} and a conclusion"),
            # doc 2 shares nothing
            (2, "completely unrelated content about database partitioning"),
        ],
    )
    ev = _docs(spark, [(100, EVAL_SENT)])
    hits = ngram_contamination(train, ev, n=13).collect()
    assert [(r["train_id"], r["eval_id"]) for r in hits] == [(1, 100)]
    assert hits[0]["n_hits"] >= 1

    drop = contaminated_ids(train, ev, n=13)
    assert [r["train_id"] for r in drop.collect()] == [1]
    kept = train.join(
        drop.withColumnRenamed("train_id", "doc_id"), "doc_id", "left_anti"
    )
    assert [r["doc_id"] for r in kept.collect()] == [2]


def test_contamination_respects_min_hits(spark):
    # exactly one shared 3-gram ("alpha beta gamma")
    train = _docs(spark, [(1, "alpha beta gamma unrelated tail words here")])
    ev = _docs(spark, [(100, "alpha beta gamma different ending entirely now")])
    assert ngram_contamination(train, ev, n=3, min_hits=1).count() == 1
    assert ngram_contamination(train, ev, n=3, min_hits=5).count() == 0


def test_contamination_broadcasts_eval_side(spark):
    train = _docs(spark, [(1, EVAL_SENT)])
    ev = _docs(spark, [(100, EVAL_SENT)])
    plan = (
        ngram_contamination(train, ev, n=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the training side must meet the eval set in a broadcast join —
    # no shuffle of the (100 TB) training corpus
    assert "BroadcastHashJoin" in plan


def test_redact_pii_markers_and_counts(spark):
    docs = _docs(
        spark,
        [
            (1, "mail alice.smith+x@corp.example.com and bob@ex.org today"),
            (2, "call 555-867-5309 or 555.867.5309 ssn 123-45-6789"),
            (3, "server at 192.168.1.100 responded"),
            (4, "no sensitive content here"),
        ],
    )
    rows = {r["id"]: r for r in redact_pii(docs).collect()}
    assert rows[1]["n_email"] == 2
    assert rows[1]["redacted"] == "mail <EMAIL> and <EMAIL> today"
    assert rows[2]["n_phone"] == 2 and rows[2]["n_ssn"] == 1
    assert rows[2]["redacted"] == "call <PHONE> or <PHONE> ssn <SSN>"
    assert rows[3]["n_ipv4"] == 1
    assert rows[3]["redacted"] == "server at <IP> responded"
    assert rows[4]["redacted"] == "no sensitive content here"
    assert all(
        rows[4][c] == 0 for c in ("n_email", "n_ssn", "n_phone", "n_ipv4")
    )


def test_redact_pii_counts_match_emitted_markers_on_overlap(spark):
    """'555-867-5309@corp.com' is one email (digits/hyphens are legal in
    the local part): the phone count must be 0 because no <PHONE> marker
    is emitted — counts are taken on the progressively redacted text."""
    docs = _docs(spark, [(1, "reach 555-867-5309@corp.com today")])
    r = redact_pii(docs).collect()[0]
    assert r["redacted"] == "reach <EMAIL> today"
    assert r["n_email"] == 1 and r["n_phone"] == 0


def test_lsh_near_dup_empty_input(spark):
    from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert embedding_near_dup_pairs(empty, 0.8, method="lsh").count() == 0


def test_repetition_flags(spark):
    from ai_vector_database_converstion_from_pdf_spark.operators.textstats import (
        repetition_flags,
    )

    docs = _docs(
        spark,
        [
            (1, "spam spam spam spam"),  # top 2-gram covers everything
            # 24 diverse tokens: every 2-gram unique -> top2 = 2/24
            (2, "the quick brown fox jumps over one lazy dog while two "
                "keen cats watch three slow birds circle four tall trees "
                "near five calm lakes"),
            (3, "word"),  # too short for any n-gram
        ],
    )
    rows = {r["id"]: r for r in repetition_flags(docs).collect()}
    assert rows[1]["top2_frac"] == 1.0 and rows[1]["keep"] is False
    assert rows[1]["ttr"] == 0.25
    assert rows[2]["keep"] is True and rows[2]["top2_frac"] <= 0.2
    assert rows[3]["top2_frac"] == 0.0 and rows[3]["keep"] is True


def test_semantic_contamination_flags_paraphrase_analog(spark):
    """A corpus vector that is a scaled+lightly-noised copy of an eval
    vector is flagged (cosine ~1 survives scaling); an orthogonal vector
    is not; zero-norm vectors can never match; empty eval => empty out."""
    from ai_vector_database_converstion_from_pdf_spark.operators.decontaminate import (
        semantic_contamination,
    )

    ev = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [
            (10, [3.0, 0.03, 0.0, 0.0]),   # scaled near-copy of eval 0
            (11, [0.0, 0.0, 1.0, 0.0]),    # orthogonal to both
            (12, [0.0, 0.0, 0.0, 0.0]),    # zero norm
            (13, [0.5, 0.5, 0.0, 0.0]),    # cos ~0.707 to BOTH
        ],
        "vec_id long, embedding array<double>",
    )
    rows = {r.vec_id: r for r in semantic_contamination(corpus, ev, 0.5).collect()}
    assert set(rows) == {10, 13}
    assert rows[10].n_eval_matches == 1 and rows[10].max_cos > 0.99
    assert rows[13].n_eval_matches == 2 and abs(rows[13].max_cos - 0.707107) < 1e-6
    empty = semantic_contamination(corpus, ev.filter("vec_id < 0"), 0.5)
    assert empty.count() == 0
    assert empty.columns == ["vec_id", "n_eval_matches", "max_cos"]
