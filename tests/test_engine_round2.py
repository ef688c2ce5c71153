"""Round-2 engine fixes (ADVICE r1): exploration injection actually
fires on cosine similarity, the query cache keys on result-shaping
options and invalidates on workspace mutations, and deep-dive context is
doc-pruned."""

from ai_vector_database_converstion_from_pdf_spark.engine import PvdbEngine


def _engine_with_near_dup_corpus(spark, tmp_path, name):
    eng = PvdbEngine(spark, str(tmp_path / name), dim=32, asof="2024-06-01 00:00:00")
    # ten chunks sharing one phrasing: every semantic candidate scores
    # cosine ~1.0 against the query, so candidates beyond the top-k pass
    # the reference's 0.65 similarity gate
    rows = [(i, f"alpha beta gamma delta variant {i % 2}") for i in range(10)]
    eng.index_documents(spark.createDataFrame(rows, "doc_id long, text string"))
    return eng


def test_exploration_injects_on_cosine(spark, tmp_path):
    eng = _engine_with_near_dup_corpus(spark, tmp_path, "x1")
    res = eng.search("alpha beta gamma delta variant 0", k=2, use_exploration=True)
    assert len(res) == 2
    # a probe from beyond the top-2 is inserted at position 2 with
    # score = top1 * 0.95 (vector_store.cpp:533-554)
    assert res[1].get("is_exploration") is True
    assert abs(res[1]["score"] - res[0]["score"] * 0.95) < 1e-9
    # and its cosine really is above the threshold the gate used
    assert res[1]["sim"] > 0.65


def test_exploration_suppressed_for_definition_intent(spark, tmp_path):
    eng = _engine_with_near_dup_corpus(spark, tmp_path, "x2")
    res = eng.search(
        "what is alpha beta gamma delta variant 0", k=2, use_exploration=True
    )
    assert not any(r.get("is_exploration") for r in res)


def test_cache_keyed_on_k_and_flags(spark, tmp_path):
    eng = _engine_with_near_dup_corpus(spark, tmp_path, "x3")
    r2 = eng.search("alpha beta gamma delta variant 1", k=2)
    assert len(r2) == 2
    # a k=5 call after a cached k=2 call must NOT return the truncated hit
    r5 = eng.search("alpha beta gamma delta variant 1", k=5)
    assert len(r5) == 5
    # same k + same flags still hits
    misses = eng.cache.misses
    again = eng.search("alpha beta gamma delta variant 1", k=5)
    assert again == r5
    assert eng.cache.misses == misses


def test_cache_invalidated_on_mutations(spark, tmp_path):
    eng = _engine_with_near_dup_corpus(spark, tmp_path, "x4")
    res = eng.search("alpha beta gamma delta variant 1", k=3)
    assert eng.cache._exact
    eng.click("alpha beta gamma delta variant 1", res[0]["id"])
    assert not eng.cache._exact  # boost changed scores -> cache dropped
    res2 = eng.search("alpha beta gamma delta variant 1", k=3)
    assert len(res2) == 3
    eng.index_documents(
        spark.createDataFrame([(100, "fresh unrelated text")], "doc_id long, text string")
    )
    assert not eng.cache._exact  # corpus grew -> cache dropped


def test_deep_dive_still_grounded_after_pruning(spark, tmp_path):
    eng = _engine_with_near_dup_corpus(spark, tmp_path, "x5")
    claims = eng.deep_dive("alpha beta gamma delta variant 0", k=3)
    assert claims
    assert all(c.source_indices for c in claims)


def test_calibrator_state_survives_sessions(spark, tmp_path):
    """VERDICT r1 #10: μ/σ persisted via workspace metadata round-trip
    into a brand-new engine instance (mainwindow.cpp:499-503)."""
    path = str(tmp_path / "calib_ws")
    eng1 = PvdbEngine(spark, path, dim=16, asof="2024-06-01 00:00:00")
    eng1.index_documents(
        spark.createDataFrame(
            [(i, f"text number {i} about joins") for i in range(6)],
            "doc_id long, text string",
        )
    )
    # drive the calibrator through a rerank so its state moves off default
    eng1.search("joins text number", k=3, use_rerank=True)
    assert eng1.calibrator.sample_count > 0
    eng1.save_session_state()
    mu, sigma = eng1.calibrator.mean, eng1.calibrator.std

    eng2 = PvdbEngine(spark, path, dim=16, asof="2024-06-01 00:00:00")
    assert eng2.calibrator.mean == mu
    assert eng2.calibrator.std == sigma
    assert eng2.calibrator.sample_count == 10  # warm-start marker

    # a workspace with no saved state still yields defaults
    eng3 = PvdbEngine(spark, str(tmp_path / "fresh_ws"), dim=16)
    assert eng3.calibrator.sample_count == 0
