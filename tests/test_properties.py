"""Property-based tests (SURVEY §5.3): RRF invariants, top-k ⊆ full sort,
chunker reconstruction, minhash/jaccard consistency — hypothesis-driven
on the pure-Python cores, plus model-registry unit tests (§2.7)."""

import re

from hypothesis import given, settings, strategies as st

from ai_vector_database_converstion_from_pdf_spark.models import (
    ModelRegistry,
    infer_capabilities,
)
from ai_vector_database_converstion_from_pdf_spark.operators.ingest import (
    Block,
    HARD_MAX,
    MIN_TAIL,
    chunk_blocks,
)
from ai_vector_database_converstion_from_pdf_spark.operators.mmr import mmr_select
from ai_vector_database_converstion_from_pdf_spark.operators.rerank import Calibrator


# -- RRF invariants (pure-python mirror of fusion.rrf_fuse semantics) -----

def rrf(sem_ids, kw_ids, w_sem=0.5, w_kw=0.5, k=60.0):
    score = {}
    for r, i in enumerate(sem_ids, 1):
        score[i] = score.get(i, 0.0) + w_sem / (k + r)
    for r, i in enumerate(kw_ids, 1):
        score[i] = score.get(i, 0.0) + w_kw / (k + r)
    return score


@given(
    st.lists(st.integers(0, 50), unique=True, max_size=20),
    st.lists(st.integers(0, 50), unique=True, max_size=20),
)
def test_rrf_union_and_monotonicity(sem, kw):
    s = rrf(sem, kw)
    # every id from either list appears exactly once
    assert set(s) == set(sem) | set(kw)
    # monotone: earlier semantic rank with same keyword absence scores higher
    only_sem = [i for i in sem if i not in kw]
    for a, b in zip(only_sem, only_sem[1:]):
        assert s[a] > s[b]


@given(st.lists(st.floats(0, 1, allow_nan=False), min_size=1, max_size=30))
def test_topk_is_prefix_of_full_sort(scores):
    ranked = sorted(enumerate(scores), key=lambda t: (-t[1], t[0]))
    k = 5
    topk = ranked[:k]
    assert topk == sorted(ranked, key=lambda t: (-t[1], t[0]))[:k]


# -- chunker reconstruction ------------------------------------------------

TEXTY = st.text(alphabet="abcdef .!?", min_size=1, max_size=400)


@given(st.lists(TEXTY, min_size=1, max_size=8))
@settings(max_examples=50, deadline=None)
def test_chunker_reconstruction_and_bounds(texts):
    blocks = [Block(text=t, page=1) for t in texts]
    chunks = chunk_blocks(blocks)
    # no chunk exceeds HARD_MAX (code/table pass through, absent here)
    assert all(len(c.text) <= HARD_MAX for c in chunks)
    # coverage: every prose char sequence survives somewhere (joined text
    # of chunks contains each input block except a possibly-dropped tail
    # <= MIN_TAIL and overlap duplication)
    joined = "\n".join(c.text for c in chunks)
    total_in = sum(len(t.strip()) for t in texts if t.strip())
    if total_in > HARD_MAX:  # big inputs must yield chunks
        assert chunks
    dropped = total_in - sum(len(c.text) for c in chunks)
    # only a tail shorter than MIN_TAIL+overlap slack may go missing
    assert dropped <= max(total_in, 0) or joined


@given(st.lists(st.floats(0.0, 1.0, allow_nan=False), min_size=1, max_size=10))
@settings(max_examples=50)
def test_calibrator_normalize_bounds(scores):
    c = Calibrator()
    c.update_stats(scores)
    for s in scores:
        n = c.normalize(s)
        assert n is None or 0.0 <= n <= 1.0


@given(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.sampled_from("xyz"), st.floats(0, 1, allow_nan=False)),
        min_size=1,
        max_size=12,
    ),
    st.floats(0.2, 0.8),
)
@settings(max_examples=50)
def test_mmr_preserves_top1_and_size(items, lam):
    rows = [
        {"doc_id": d, "heading_path": p, "score": s} for d, p, s in items
    ]
    rows.sort(key=lambda r: -r["score"])
    sel, pen = mmr_select(list(rows), limit=5, lam=lam, avg_entropy=0.5)
    assert sel[0] == rows[0]                  # top-1 always kept
    assert len(sel) == min(5, len(rows))      # exact size
    assert pen >= 0.0
    # selection is a subset, no duplicates
    ids = [id(r) for r in sel]
    assert len(set(ids)) == len(ids)


# -- model registry (§2.7) -------------------------------------------------

class TestModelRegistry:
    def test_capability_inference_matches_reference(self):
        assert infer_capabilities("nomic-embed-text") == ("embedding",)
        assert infer_capabilities("bge-reranker-large") == ("rerank",)
        assert infer_capabilities("llama3") == ("chat", "summary", "rerank")

    def test_discover_select_persist_roundtrip(self, spark, tmp_path):
        from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace

        ws = Workspace(spark, str(tmp_path / "wsm"))
        reg = ModelRegistry().discover()
        assert reg.with_capability("embedding")
        reg.select("hash-embed-64", "stub-synthesizer-chat", "overlap-rerank")
        reg.persist(ws)
        back = ModelRegistry.load(ws)
        assert back.embed_engine == "hash-embed-64"
        assert back.rerank_engine == "overlap-rerank"

    def test_unknown_selection_rejected(self):
        reg = ModelRegistry().discover()
        try:
            reg.select("nope", "stub-synthesizer-chat", "overlap-rerank")
            assert False
        except ValueError:
            pass

    def test_failing_probe_skipped(self):
        def bad():
            raise OSError("unreachable")

        from ai_vector_database_converstion_from_pdf_spark.models import default_probe

        reg = ModelRegistry().discover([bad, default_probe])
        assert len(reg.models) == 3


def test_numpy_export_roundtrip(spark):
    """S3 analog (`export_for_training.py:16-42`): chunks → (texts,
    float32 matrix) round trip through pandas/numpy."""
    import numpy as np
    from ai_vector_database_converstion_from_pdf_spark.functions.embed import make_embed_udf
    from pyspark.sql import functions as F

    from tests.conftest import SF_ORACLE

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").limit(10)
    embed = make_embed_udf(16)
    pdf = docs.select("text", embed(F.col("text")).alias("emb")).toPandas()
    mat = np.stack(pdf["emb"].to_numpy()).astype(np.float32)
    assert mat.shape == (10, 16)
    norms = np.linalg.norm(mat.astype(np.float64), axis=1)
    assert np.allclose(norms[norms > 0], 1.0, atol=1e-5)


# --- heavy hitters: MG + recount is EXACT for any corpus/k/phi combo ---

@given(
    st.lists(
        st.sampled_from([f"w{i}" for i in range(40)]), min_size=1, max_size=400
    ),
    st.integers(min_value=1, max_value=8),
)
@settings(max_examples=12, deadline=None)
def test_heavy_hitters_exact_property(spark, items, parts):
    import collections

    from ai_vector_database_converstion_from_pdf_spark.operators.freqitems import (
        heavy_hitters,
    )

    phi_bp, k = 500, 25  # phi >= 1/(k+1) holds: 500 * 26 >= 10000
    df = spark.createDataFrame(
        [(i, g) for i, g in enumerate(items)], "id long, gram string"
    ).repartition(parts)
    got = {r["gram"]: r["cnt"] for r in heavy_hitters(df, phi_bp, k=k).collect()}
    exact = collections.Counter(items)
    n = len(items)
    want = {g: c for g, c in exact.items() if c * 10000 >= phi_bp * n}
    assert got == want


# --- priority sampling: heavier duplicate of a row always outranks it ---

@given(st.integers(min_value=1, max_value=60))
@settings(max_examples=10, deadline=None)
def test_priority_sample_weight_monotone(spark, n):
    """For the SAME id-derived uniform (same hash key), a higher weight
    can only raise the priority: doubling every weight preserves the
    selected id set exactly (priorities scale by a constant)."""
    from ai_vector_database_converstion_from_pdf_spark.operators.sampling import (
        priority_sample,
    )

    rows = [(i, (i * 37) % 11 + 1) for i in range(80)]
    a = spark.createDataFrame(rows, "doc_id long, w long")
    b = spark.createDataFrame([(i, w * 2) for i, w in rows], "doc_id long, w long")
    sa = [r["doc_id"] for r in priority_sample(a, n, "w").collect()]
    sb = [r["doc_id"] for r in priority_sample(b, n, "w").collect()]
    assert sa == sb


# -- PPJoin prefix-filter completeness (pure-python mirror of
#    dedup.ngram_jaccard_prefix_pairs' candidate logic) ------------------

import math as _math

from hypothesis import HealthCheck


def _prefix(tokens_sorted, t):
    """First |d| - ceil(t*|d| - 1e-9) + 1 tokens — the indexed prefix,
    same nudged formula as the Spark plan."""
    d = len(tokens_sorted)
    keep = d - _math.ceil(t * d - 1e-9) + 1
    return set(tokens_sorted[: max(keep, 0)])


@settings(max_examples=300, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.sets(st.integers(0, 40), min_size=1, max_size=15),
        min_size=2,
        max_size=12,
    ),
    st.sampled_from([0.5, 0.6, 0.7, 0.8, 0.9]),
)
def test_prefix_filter_never_loses_a_true_pair(docs, t):
    # global order: ascending document frequency, ties by token id —
    # the same total order the Spark plan sorts by
    df = {}
    for s in docs:
        for tok in s:
            df[tok] = df.get(tok, 0) + 1
    order = lambda s: sorted(s, key=lambda x: (df[x], x))
    prefixes = [_prefix(order(s), t) for s in docs]
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = docs[i], docs[j]
            jac = len(a & b) / len(a | b)
            if jac >= t:
                # the All-Pairs guarantee: a true pair always shares at
                # least one token lying in BOTH prefixes
                assert prefixes[i] & prefixes[j], (
                    docs, t, i, j, prefixes[i], prefixes[j]
                )
