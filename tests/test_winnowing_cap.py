"""Winnowing match-pair cap parity (r3 item 9): the hot-fingerprint cap
is the scale control AND a documented under-counter on boilerplate-dense
corpora. These tests pin the exact mode (max_doc_freq=None), the capped
mode's drop behavior, and the cap report that quantifies the gap."""

from pyspark.sql import functions as F

BOILER = "this license header is identical boilerplate text repeated verbatim across every document in the corpus "
UNIQ = "zqxjkwv unique shared passage appearing only in the matched pair of documents and nowhere else at all "


def _corpus(spark, n_boiler=12):
    rows = []
    # n_boiler docs that share ONLY boilerplate (pairwise matches exist
    # solely through hot fingerprints)
    for i in range(n_boiler):
        rows.append((i, BOILER * 4 + f"tail {i} " * 3))
    # one genuine pair sharing a long unique passage (cold fingerprints)
    rows.append((100, UNIQ * 4 + "alpha suffix one"))
    rows.append((101, UNIQ * 4 + "beta suffix two"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cap_drops_hot_only_pairs_exact_recovers(spark):
    from ai_vector_database_converstion_from_pdf_spark.operators.textstats import (
        winnowing_matches,
    )

    docs = _corpus(spark)
    # cap below the boilerplate family size: its fingerprints are hot
    capped = {
        (r.id_a, r.id_b): r.n_shared
        for r in winnowing_matches(docs, min_shared=3, max_doc_freq=8).collect()
    }
    exact = {
        (r.id_a, r.id_b): r.n_shared
        for r in winnowing_matches(docs, min_shared=3, max_doc_freq=None).collect()
    }
    # the genuine pair survives both modes; the capped count may run
    # slightly LOW when one of its shared fingerprints happens to also
    # be boilerplate-hot — exactly the documented under-count
    assert (100, 101) in capped and (100, 101) in exact
    assert 0 < capped[(100, 101)] <= exact[(100, 101)]
    # boilerplate-only pairs exist in exact mode but are capped away
    boiler_exact = [p for p in exact if p[0] < 50 and p[1] < 50]
    boiler_capped = [p for p in capped if p[0] < 50 and p[1] < 50]
    assert boiler_exact, "exact mode must surface the boilerplate family"
    assert not boiler_capped, "capped mode must drop hot-only pairs"
    # capped is a SUBSET with never-higher counts (pure under-count)
    for p, n in capped.items():
        assert exact[p] >= n


def test_cap_noop_below_threshold(spark):
    from ai_vector_database_converstion_from_pdf_spark.operators.textstats import (
        winnowing_matches,
    )

    docs = _corpus(spark, n_boiler=4)  # family smaller than the cap
    capped = sorted(
        tuple(r) for r in winnowing_matches(docs, min_shared=3, max_doc_freq=50).collect()
    )
    exact = sorted(
        tuple(r) for r in winnowing_matches(docs, min_shared=3, max_doc_freq=None).collect()
    )
    assert capped == exact


def test_cap_report_quantifies_drop(spark):
    from ai_vector_database_converstion_from_pdf_spark.operators.textstats import (
        winnowing_cap_report,
    )

    docs = _corpus(spark)
    rep = winnowing_cap_report(docs, max_doc_freq=8).collect()[0]
    assert rep.n_hot > 0  # the boilerplate fingerprints are over cap
    assert rep.max_df >= 12  # shared by the whole boilerplate family
    # C(12,2)=66 pairs per hot fingerprint — the dropped volume bound
    assert rep.pairs_dropped_bound >= 66
    assert rep.pairs_kept_bound >= 1  # the genuine pair's cold prints
    rep_hi = winnowing_cap_report(docs, max_doc_freq=500).collect()[0]
    assert rep_hi.n_hot == 0 and rep_hi.pairs_dropped_bound == 0


def test_auto_dispatch_exact_when_affordable(spark):
    """Under budget the auto mode IS the exact mode: boilerplate-only
    pairs survive (nothing dropped)."""
    from ai_vector_database_converstion_from_pdf_spark.operators.textstats import (
        winnowing_matches,
    )

    docs = _corpus(spark)
    auto = sorted(
        tuple(r)
        for r in winnowing_matches(docs, min_shared=3, max_doc_freq="auto").collect()
    )
    exact = sorted(
        tuple(r)
        for r in winnowing_matches(docs, min_shared=3, max_doc_freq=None).collect()
    )
    assert auto == exact
    assert any(a < 50 and b < 50 for a, b, _ in auto)  # boilerplate family kept


def test_auto_dispatch_caps_over_budget(spark):
    """Over budget the auto mode applies auto_cap: identical output to
    the capped run — the replica family is dropped, the genuine pair
    survives through its cold fingerprints."""
    from ai_vector_database_converstion_from_pdf_spark.operators.textstats import (
        winnowing_matches,
    )

    docs = _corpus(spark)
    auto = sorted(
        tuple(r)
        for r in winnowing_matches(
            docs, min_shared=3, max_doc_freq="auto", auto_pair_budget=10, auto_cap=8
        ).collect()
    )
    capped = sorted(
        tuple(r)
        for r in winnowing_matches(docs, min_shared=3, max_doc_freq=8).collect()
    )
    assert auto == capped
    assert all(not (a < 50 and b < 50) for a, b, _ in auto)
    assert any((a, b) == (100, 101) for a, b, _ in auto)
