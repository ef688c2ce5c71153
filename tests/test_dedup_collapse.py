"""Exact-duplicate collapse pre-stage for the text near-dup families.

The collapsed plan (run the pair family over one representative per
md5(lower(trim(text))) class, expand rep pairs back to members) must be
OUTPUT-IDENTICAL to the direct plan — pair scores depend on the text
only through tokens(), which is constant within a class. These tests
pin that equality on a corpus engineered with every edge the expansion
must honor: case/whitespace variants in one class, singleton classes,
empty/whitespace-only docs, docs below the shingle width, and a
threshold no identity pair can clear.

The reference dedups whole files only (docId = MD5(name+size),
pdf_processor.cpp:409-416); exact-collapse-before-near-dup is the
content-level, web-scale extension (cf. RefinedWeb/Dolma pipelines).
"""

import pyspark.sql.functions as F
import pytest

from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
    exact_collapse_classes,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    ngram_jaccard_prefix_pairs,
    simhash_pairs,
)


def _corpus(spark):
    """Dup-heavy corpus: class A has 4 members (two verbatim, one cased,
    one padded), class B has 3 verbatim members plus a near-dup D that
    is similar-but-not-identical to B, two empty-ish classes (empty
    string x2, whitespace x2), a 2-token class (below the 3-shingle
    width) x2, and singletons."""
    base_a = "the quick brown fox jumps over the lazy dog near the river bank"
    base_b = "training data pipelines need exact dedup before minhash at corpus scale"
    near_b = "training data pipelines need exact dedup before minhash at web scale"
    rows = [
        ("a1", base_a),
        ("a2", base_a),
        ("a3", base_a.upper()),
        ("a4", "  " + base_a + "  "),
        ("b1", base_b),
        ("b2", base_b),
        ("b3", base_b),
        ("d1", near_b),
        ("e1", ""),
        ("e2", ""),
        ("w1", "   "),
        ("w2", "   "),
        ("t1", "two tokens"),
        ("t2", "two tokens"),
        ("s1", "a singleton document about something else entirely unique"),
        ("s2", "another lone text sharing no shingles with anything here"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _rows(df):
    cols = df.columns
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_classes_shape(spark):
    cls = exact_collapse_classes(_corpus(spark))
    got = {r["rep"]: (list(r["members"]), r["m"]) for r in cls.collect()}
    assert got["a1"] == (["a1", "a2", "a3", "a4"], 4)
    assert got["b1"] == (["b1", "b2", "b3"], 3)
    # "   " trims to "", so the whitespace docs join the empty-string class
    assert got["e1"] == (["e1", "e2", "w1", "w2"], 4)
    assert got["t1"] == (["t1", "t2"], 2)
    assert got["s1"] == (["s1"], 1)
    assert "w1" not in got and "w2" not in got


def test_whitespace_and_empty_share_class(spark):
    cls = exact_collapse_classes(_corpus(spark))
    row = [r for r in cls.collect() if r["rep"] == "e1"]
    assert len(row) == 1
    assert list(row[0]["members"]) == ["e1", "e2", "w1", "w2"]


@pytest.mark.parametrize("threshold", [0.5, 0.8, 1.0])
def test_ngram_jaccard_collapse_equals_direct(spark, threshold):
    docs = _corpus(spark)
    direct = _rows(ngram_jaccard_pairs(docs, threshold=threshold))
    coll = _rows(ngram_jaccard_pairs(docs, threshold=threshold, collapse=True))
    assert coll == direct
    assert len(direct) > 0


def test_prefix_collapse_equals_direct(spark):
    docs = _corpus(spark)
    direct = _rows(ngram_jaccard_prefix_pairs(docs, threshold=0.5))
    coll = _rows(ngram_jaccard_prefix_pairs(docs, threshold=0.5, collapse=True))
    assert coll == direct
    # the near-dup cross-class pair must expand to every B member
    ids = {(a, b) for a, b, _ in direct}
    assert {("b1", "d1"), ("b2", "d1"), ("b3", "d1")} <= ids


def test_minhash_collapse_equals_direct(spark):
    docs = _corpus(spark)
    direct = _rows(minhash_lsh_pairs(docs, threshold=0.5))
    coll = _rows(minhash_lsh_pairs(docs, threshold=0.5, collapse=True))
    assert coll == direct
    assert len(direct) > 0


def test_simhash_collapse_equals_direct(spark):
    docs = _corpus(spark)
    direct = _rows(simhash_pairs(docs, max_hamming=3))
    coll = _rows(simhash_pairs(docs, max_hamming=3, collapse=True))
    assert coll == direct
    # within-class pairs carry hamming 0; the 2-token class qualifies
    # for simhash (min_tokens=1) even though it has no 3-shingles
    ids = {(a, b): h for a, b, h in direct}
    assert ids[("t1", "t2")] == 0


def test_no_identity_pairs_for_subshingle_docs(spark):
    """The 2-token class has no 3-shingles: the direct Jaccard plans
    emit nothing for it, so the collapsed plan must not invent a pair."""
    docs = _corpus(spark)
    for fn in (
        lambda d, c: ngram_jaccard_pairs(d, threshold=0.5, collapse=c),
        lambda d, c: ngram_jaccard_prefix_pairs(d, threshold=0.5, collapse=c),
        lambda d, c: minhash_lsh_pairs(d, threshold=0.5, collapse=c),
    ):
        got = {(r["id_a"], r["id_b"]) for r in fn(docs, True).collect()}
        assert ("t1", "t2") not in got
        assert ("e1", "e2") not in got
        assert ("w1", "w2") not in got


def test_null_text_class_is_inert(spark):
    docs = spark.createDataFrame(
        [("n1", None), ("n2", None), ("x1", "real text with enough tokens here")],
        "doc_id string, text string",
    )
    for collapse in (False, True):
        got = _rows(ngram_jaccard_pairs(docs, threshold=0.5, collapse=collapse))
        assert got == []


def test_auto_probe_collapses_on_dup_heavy(spark, caplog):
    """'auto' on a dup-heavy corpus must pick the collapsed plan (log
    line) and still match the direct output."""
    import logging

    docs = _corpus(spark)
    with caplog.at_level(
        logging.INFO,
        logger="ai_vector_database_converstion_from_pdf_spark.operators.dedup",
    ):
        coll = _rows(simhash_pairs(docs, max_hamming=3, collapse="auto"))
    assert any("collapsed plan" in r.message for r in caplog.records)
    assert coll == _rows(simhash_pairs(docs, max_hamming=3))


def test_auto_probe_stays_direct_on_unique_corpus(spark, caplog):
    import logging

    rows = [(f"u{i}", f"wholly unique document number {i} with token {i * 7}")
            for i in range(40)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    with caplog.at_level(
        logging.INFO,
        logger="ai_vector_database_converstion_from_pdf_spark.operators.dedup",
    ):
        got = _rows(ngram_jaccard_pairs(docs, threshold=0.5, collapse="auto"))
    assert any("direct plan" in r.message for r in caplog.records)
    assert got == _rows(ngram_jaccard_pairs(docs, threshold=0.5))


def test_capped_plan_ignores_collapse(spark):
    """max_doc_freq changes posting sizes, which collapse would alter —
    the cap plan must ignore the flag and stay cap-exact."""
    docs = _corpus(spark)
    capped = _rows(
        ngram_jaccard_pairs(docs, threshold=0.5, max_doc_freq=2, collapse=True)
    )
    assert capped == _rows(
        ngram_jaccard_pairs(docs, threshold=0.5, max_doc_freq=2)
    )


def test_vector_collapse_equals_direct(spark):
    """embedding_near_dup_pairs collapse=True must equal the direct
    plan on a replica-heavy vector corpus, including: replicated
    vectors (identity cos=1.0), a zero vector class (no pair — NaN
    cosine never clears the threshold), and null vectors (inert)."""
    from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )

    base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    dim = len(base.select("embedding").first()[0])
    reps = base.select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    extra = spark.createDataFrame(
        [
            (900001, [0.0] * dim),
            (900002, [0.0] * dim),
            (900003, None),
            (900004, None),
        ],
        "vec_id long, embedding array<float>",
    )
    emb = base.unionByName(reps).unionByName(extra)

    def rows(df):
        return sorted(
            (r["id_a"], r["id_b"], round(r["cos"], 6)) for r in df.collect()
        )

    direct = rows(embedding_near_dup_pairs(emb, threshold=0.45))
    coll = rows(embedding_near_dup_pairs(emb, threshold=0.45, collapse=True))
    assert coll == direct
    # every base id pairs with its replica at cos 1.0
    got = {(a, b): c for a, b, c in coll}
    some_id = base.select("vec_id").first()[0]
    assert got[(some_id, some_id + 100000)] == 1.0
    # zero/null vector classes emit nothing
    assert (900001, 900002) not in got
    assert (900003, 900004) not in got


def test_vector_collapse_nonfinite_classes_are_inert(spark):
    """Duplicated vectors containing inf/NaN must emit NO within-class
    identity pair: their cosine is NaN in every direct plan. (Review
    finding: the sq>0 guard alone let inf-norm classes through.)"""
    from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )

    inf, nan = float("inf"), float("nan")
    emb = spark.createDataFrame(
        [
            (1, [inf, 0.0, 1.0]),
            (2, [inf, 0.0, 1.0]),
            (3, [nan, 1.0, 0.0]),
            (4, [nan, 1.0, 0.0]),
            (5, [1.0, 2.0, 3.0]),
            (6, [1.0, 2.0, 3.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in embedding_near_dup_pairs(
            emb, threshold=0.45, collapse=True
        ).collect()
    }
    assert (1, 2) not in got
    assert (3, 4) not in got
    assert got[(5, 6)] == 1.0


def test_vector_collapse_auto_keeps_exact_gemm(spark, caplog):
    """On a replica-heavy corpus big enough that the raw FLOP probe
    would pick approximate LSH, collapse='auto' + method='auto' must
    collapse first and stay on the EXACT GEMM path (no lsh switch log),
    returning the same pairs as the forced-exact direct plan."""
    import logging

    from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )

    base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = base.count()
    dim = len(base.select("embedding").first()[0])
    emb = base
    for k in (1, 2, 3):
        emb = emb.unionByName(
            base.select((F.col("vec_id") + 100000 * k).alias("vec_id"), "embedding")
        )
    # budget chosen so 4n fails the brute bound but n passes
    budget = float(n * n * dim * 4)
    with caplog.at_level(
        logging.INFO,
        logger="ai_vector_database_converstion_from_pdf_spark.operators.dedup",
    ):
        coll = embedding_near_dup_pairs(
            emb, threshold=0.45, method="auto", flop_budget=budget,
            collapse="auto",
        ).collect()
    assert any("collapsed plan" in r.message for r in caplog.records)
    assert not any("switching" in r.message for r in caplog.records)
    want = embedding_near_dup_pairs(
        emb, threshold=0.45, method="gemm"
    ).collect()
    key = lambda r: (r["id_a"], r["id_b"])  # noqa: E731
    assert sorted(map(key, coll)) == sorted(map(key, want))


def test_simhash_incident_equals_filtered_full(spark):
    """simhash_pairs_incident(ids) == simhash_pairs filtered to pairs
    with an endpoint in ids — on the replica-heavy corpus AND the raw
    fixture (ids present and absent, dup classes included)."""
    from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
        simhash_pairs_incident,
    )

    docs = _corpus(spark)
    ids = ["b1", "t1", "zz-missing"]
    full = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_pairs(docs, max_hamming=3).collect()
        if r["id_a"] in ids or r["id_b"] in ids
    }
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_pairs_incident(docs, ids, max_hamming=3).collect()
    }
    assert got == full
    assert len(full) > 0

    fx = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    fids = [r["doc_id"] for r in fx.limit(3).collect()]
    full2 = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_pairs(fx, max_hamming=3).collect()
        if r["id_a"] in fids or r["id_b"] in fids
    }
    got2 = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_pairs_incident(fx, fids, max_hamming=3).collect()
    }
    assert got2 == full2


def test_collapse_on_fixture_sample(spark):
    """sf0.001 documents: collapse=True equals direct on real fixture
    data (mostly unique texts — exercises the singleton-heavy shape)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    direct = _rows(minhash_lsh_pairs(docs, threshold=0.8))
    coll = _rows(minhash_lsh_pairs(docs, threshold=0.8, collapse=True))
    assert coll == direct


# --- winnowing collapse (VERDICT r10 #2) ------------------------------------


def _winnow(docs, **kw):
    from ai_vector_database_converstion_from_pdf_spark.operators.textstats import (
        winnowing_matches,
    )

    return winnowing_matches(docs, **kw)


def test_winnowing_collapse_equals_direct_exact(spark):
    """Exact mode (max_doc_freq=None): the collapsed plan must emit the
    same (pair, n_shared) multiset, including within-class pairs whose
    n_shared is the CLASS fingerprint count (not a constant identity
    score — the reason this family has its own expansion)."""
    docs = _corpus(spark)
    direct = _rows(_winnow(docs, min_shared=2, max_doc_freq=None))
    coll = _rows(_winnow(docs, min_shared=2, max_doc_freq=None, collapse=True))
    assert coll == direct
    assert len(direct) > 0
    # class A pairs exist with a per-class (not lit) n_shared
    got = {(a, b): n for a, b, n in direct}
    assert ("a1", "a2") in got and got[("a1", "a2")] >= 2
    assert got[("a1", "a2")] == got[("a3", "a4")]


def test_winnowing_collapse_equals_direct_capped(spark):
    """Capped mode: a fingerprint hot ONLY via replicas (class B fp
    shared with near-dup d1 has member df 4 > cap 3) must be dropped by
    BOTH plans — the collapsed keep rule resolves on member-level
    df = Σm, not rep-level df."""
    docs = _corpus(spark)
    for cap in (2, 3, 50):
        direct = _rows(_winnow(docs, min_shared=1, max_doc_freq=cap))
        coll = _rows(
            _winnow(docs, min_shared=1, max_doc_freq=cap, collapse=True)
        )
        assert coll == direct, f"cap={cap}"
    # cap=3: B-class fingerprints survive (df=3) so (b1,b2) remains;
    # every fp shared by B and d1 has df=4 and is dropped, so no
    # cross pair (b*, d1) survives
    got = {
        (a, b)
        for a, b, _ in _rows(
            _winnow(docs, min_shared=1, max_doc_freq=3, collapse=True)
        )
    }
    assert ("b1", "b2") in got
    assert not any(b == "d1" for _, b in got)


def test_winnowing_collapse_auto_probe(spark, caplog):
    """collapse='auto' on the dup-heavy corpus takes the collapsed plan
    (probe log) and matches direct; max_doc_freq='auto' under collapse
    resolves to exact on this tiny volume."""
    import logging

    docs = _corpus(spark)
    with caplog.at_level(
        logging.INFO,
        logger="ai_vector_database_converstion_from_pdf_spark.operators.dedup",
    ):
        coll = _rows(
            _winnow(docs, min_shared=2, max_doc_freq="auto", collapse="auto")
        )
    assert any("collapsed plan" in r.message for r in caplog.records)
    assert coll == _rows(_winnow(docs, min_shared=2, max_doc_freq=None))


def test_winnowing_collapse_on_fixture_sample(spark):
    """sf0.001 documents at the catalog entry's parameters: collapse
    parity on real fixture data (singleton-heavy shape)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    direct = _rows(_winnow(docs, min_shared=40, max_doc_freq=50))
    coll = _rows(_winnow(docs, min_shared=40, max_doc_freq=50, collapse=True))
    assert coll == direct
