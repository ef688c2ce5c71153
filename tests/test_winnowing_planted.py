"""winnowing_matches on PLANTED shared passages (VERDICT r11 #5).

Every prior tier returned 0 rows from winnowing_matches — correct
(shared fingerprints were all boilerplate-hot, over the df cap) but it
meant the operator's actual purpose, plagiarism/boilerplate span
detection across otherwise-distinct docs, was never exercised beyond
the sf0.01 oracle. This plants verbatim 30-token passages
(tools/make_stress_fixture._planted_passage_text — the same column the
--planted-passages tier mode uses) into a fraction of otherwise
distinct docs and asserts FULL recall: every same-passage doc pair is
matched, with the planted fingerprints under the df cap while the
group structure stays intact.
"""

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from tools.make_stress_fixture import _planted_passage_text  # noqa: E402

from ai_vector_database_converstion_from_pdf_spark.operators.textstats import (  # noqa: E402
    winnowing_cap_report,
    winnowing_matches,
)

# stress-tier sweep on generated fixtures: opt-in (VERDICT r13 #8)
pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.001"
N_PASSAGES = 8
PCT = 10  # ~50 of 500 docs planted -> ~6 docs per passage, df << 50


@pytest.fixture(scope="module")
def planted(spark):
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .withColumn("_rep", F.lit(0))
        .withColumn("text", _planted_passage_text(F, N_PASSAGES, PCT))
        .withColumn(
            "pid",
            F.when(
                F.pmod(
                    F.xxhash64(F.col("doc_id"), F.col("_rep"), F.lit("pp")),
                    F.lit(100),
                )
                < F.lit(PCT),
                F.pmod(
                    F.xxhash64(
                        F.col("doc_id"), F.col("_rep"), F.lit("ppid")
                    ),
                    F.lit(N_PASSAGES),
                ),
            ),
        )
        .drop("_rep")
        .localCheckpoint(eager=True)
    )
    return docs


def _expected_pairs(docs):
    """All (id_a < id_b) doc pairs sharing a planted passage."""
    a = docs.filter(F.col("pid").isNotNull()).select(
        F.col("doc_id").alias("id_a"), "pid"
    )
    b = docs.filter(F.col("pid").isNotNull()).select(
        F.col("doc_id").alias("id_b"), "pid"
    )
    return (
        a.join(b, "pid")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )


def test_planted_passages_fully_recovered(spark, planted):
    want = {(r["id_a"], r["id_b"]) for r in _expected_pairs(planted).collect()}
    assert len(want) > 20  # the fixture actually planted groups
    got = {
        (r["id_a"], r["id_b"])
        for r in winnowing_matches(planted.select("doc_id", "text")).collect()
    }
    missing = want - got
    assert not missing, f"{len(missing)} planted pairs missed: {sorted(missing)[:5]}"


def test_planted_fingerprints_under_cap(spark, planted):
    """The planted grams' df == group size << the 50 cap — the passage
    detector path, NOT the boilerplate-hot path the tiers kept hitting."""
    max_group = (
        planted.filter(F.col("pid").isNotNull())
        .groupBy("pid")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert max_group <= 50
    rep = winnowing_cap_report(planted.select("doc_id", "text")).first()
    # shared fingerprints exist and are (almost) all under the cap
    assert rep["n_fingerprints"] > 0
    assert rep["n_hot"] < rep["n_fingerprints"]


def test_collapse_parity_on_planted(spark, planted):
    """The collapsed plan returns the identical match set on the
    planted corpus (the r11 parity contract, now on a fixture where
    the output is non-empty)."""
    base = planted.select("doc_id", "text")
    direct = {
        tuple(r)
        for r in winnowing_matches(base).select(
            "id_a", "id_b", "n_shared"
        ).collect()
    }
    collapsed = {
        tuple(r)
        for r in winnowing_matches(base, collapse=True).select(
            "id_a", "id_b", "n_shared"
        ).collect()
    }
    assert direct == collapsed and len(direct) > 0
