"""Persisted IVF index maintenance (second maintained index family):
centroids train once at build and persist; the assignment table follows
add/merge/delete with the same doc-keyed, bucket-scoped rewrites as the
chunk table. Invariant: after any DML sequence, the maintained
assignments equal re-assigning the current chunks against the SAME
persisted centroids (assignment is deterministic given centroids), and
untouched index bucket directories stay byte-identical."""

from pyspark.sql import functions as F

from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace
from tests.test_workspace_streaming_multimodal import _chunks_df
from tools.fswalk import snapshot as _snapshot

DIM = 16
K = 4


def _assign_set(df):
    return {(r["id"], r["centroid_id"]) for r in df.select("id", "centroid_id").collect()}


def _rebuild_set(ws):
    cents = ws._ivf_centroids()
    chunks = ws.spark.read.parquet(ws._tbl("chunks"))
    return _assign_set(ws._ivf_assign_rows(chunks, cents))


def test_ivf_maintained_through_dml(spark, tmp_path):
    ws = Workspace(spark, str(tmp_path / "ivf_ws"))
    ws.add_chunks(_chunks_df(spark, n=30, dim=DIM), partition_buckets=8)
    n = ws.build_ivf_index(dim=DIM, n_centroids=K, sample_size=30)
    assert n == 30
    idx = ws.ivf_index()
    assert idx is not None and idx[3] == K

    # MERGE one doc: re-assigned against the PERSISTED centroids (no
    # retrain), only the touched index bucket directory rewritten
    cents_before = ws._ivf_centroids()
    k = ws._doc_buckets(["7"], 8)[0]
    before = _snapshot(ws._tbl("ann_ivf"))
    upd = (
        _chunks_df(spark, n=30, dim=DIM)
        .filter(F.col("doc_id") == "7")
        .withColumn("text", F.lit("completely different content now"))
    )
    from ai_vector_database_converstion_from_pdf_spark.functions.embed import (
        make_embed_udf,
    )

    upd = upd.withColumn("embedding", make_embed_udf(DIM)(F.col("text")))
    ws.merge_chunks(upd)
    assert ws._ivf_centroids() == cents_before  # centroids untouched
    assert _assign_set(ws.ivf_index()[0]) == _rebuild_set(ws)
    after = _snapshot(ws._tbl("ann_ivf"))
    ub = {p: h for p, h in before.items() if f"_bucket={k}/" not in p}
    ua = {p: h for p, h in after.items() if f"_bucket={k}/" not in p}
    assert ub == ua

    # DELETE: the doc's assignment rows vanish
    ws.delete_doc("3")
    idx_df = ws.ivf_index()[0]
    assert idx_df.filter(F.col("doc_id") == "3").count() == 0
    assert _assign_set(idx_df) == _rebuild_set(ws)

    # APPEND: new rows assigned map-side and appended
    extra = _chunks_df(spark, n=32, dim=DIM).filter(F.col("id") >= 30)
    ws.add_chunks(extra, partition_buckets=8)
    assert _assign_set(ws.ivf_index()[0]) == _rebuild_set(ws)


def test_ivf_candidates_prune_and_contain_neighbors(spark, tmp_path):
    ws = Workspace(spark, str(tmp_path / "ivf_cand"))
    ws.add_chunks(_chunks_df(spark, n=40, dim=DIM), partition_buckets=4)
    ws.build_ivf_index(dim=DIM, n_centroids=K, sample_size=40)

    qvec = ws.chunks().filter(F.col("id") == 5).select("embedding").first()[0]
    cand = ws.ivf_candidates(qvec, n_probe=1)
    n_cand = cand.count()
    assert 0 < n_cand < 40  # probing 1 of 4 cells prunes the corpus
    # the query's own row lives in the probed cell (it IS its nearest
    # neighbor, so its centroid is the query's nearest centroid)
    assert cand.filter(F.col("id") == 5).count() == 1
    # probing every cell covers everything
    assert ws.ivf_candidates(qvec, n_probe=K).count() == 40


def test_ivf_absent_returns_none_and_clear_removes(spark, tmp_path):
    ws = Workspace(spark, str(tmp_path / "ivf_clear"))
    ws.add_chunks(_chunks_df(spark, n=10, dim=DIM))
    assert ws.ivf_index() is None
    assert ws.ivf_candidates([0.0] * DIM) is None
    ws.build_ivf_index(dim=DIM, n_centroids=2, sample_size=10)
    assert ws.ivf_index() is not None
    ws.clear()
    assert ws.ivf_index() is None
    assert ws.get_metadata("ivf_params") is None


def test_ivf_unbucketed_maintenance(spark, tmp_path):
    ws = Workspace(spark, str(tmp_path / "ivf_flat"))
    ws.add_chunks(_chunks_df(spark, n=12, dim=DIM))
    ws.build_ivf_index(dim=DIM, n_centroids=3, sample_size=12)
    ws.delete_doc("1")
    assert _assign_set(ws.ivf_index()[0]) == _rebuild_set(ws)
    upd = (
        _chunks_df(spark, n=12, dim=DIM)
        .filter(F.col("doc_id") == "2")
        .withColumn("text", F.lit("changed"))
    )
    ws.merge_chunks(upd)
    assert _assign_set(ws.ivf_index()[0]) == _rebuild_set(ws)


def test_search_uses_maintained_ivf_index(spark, tmp_path):
    """IVF-backed serving: with only an IVF index (no LSH), use_ann auto
    routes the semantic branch through the coarse-quantizer candidates.
    Built with 2 centroids and served with an EXPLICIT n_probe=2, the
    candidate set is the whole corpus, so results must EQUAL the exact
    full scan (the engine default is now n_probe=None → the auto
    fraction, which on a deliberately tiny 2-cell index probes 1 cell
    and is legitimately approximate — this test pins routing
    correctness, not recall, hence full coverage)."""
    from tests.conftest import SF_ORACLE

    from ai_vector_database_converstion_from_pdf_spark.engine import PvdbEngine

    eng = PvdbEngine(
        spark, str(tmp_path / "eng_ivf"), dim=16, asof="2024-06-01 00:00:00",
        ivf_n_probe=2,
    )
    docs = (
        spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .limit(40)
        .select("doc_id", "text")
    )
    eng.index_documents(docs)
    with_scan = eng.search("merge fast table join", k=3, use_ann=False)

    eng.workspace.build_ivf_index(dim=16, n_centroids=2, sample_size=40)
    assert eng.workspace.ann_index() is None  # no LSH — IVF is the route
    eng.cache.clear()
    with_ivf = eng.search("merge fast table join", k=3)  # auto-probes IVF
    assert [r["id"] for r in with_ivf] == [r["id"] for r in with_scan]

    # use_ann=True is satisfied by the IVF index alone
    eng.cache.clear()
    forced = eng.search("merge fast table join", k=3, use_ann=True)
    assert [r["id"] for r in forced] == [r["id"] for r in with_scan]

    # the index survives (and tracks) DML through serving
    top = with_ivf[0]["id"]
    eng.delete_document(str(top))
    after = eng.search("merge fast table join", k=3)
    assert all(r["id"] != top for r in after)


def test_optimize_compacts_index_tables(spark, tmp_path):
    """optimize() also compacts the maintained index tables: repeated
    appends leave one file per touched bucket per batch; after
    compaction the content is unchanged and file counts drop."""
    import glob

    ws = Workspace(spark, str(tmp_path / "ivf_opt"))
    first = _chunks_df(spark, n=40, dim=DIM)
    ws.add_chunks(first.filter(F.col("id") < 10), partition_buckets=2)
    ws.build_ann_index(dim=DIM, n_planes=3, n_tables=4)
    ws.build_ivf_index(dim=DIM, n_centroids=2, sample_size=10)
    for lo in (10, 20, 30):  # repeated appends -> small files pile up
        ws.add_chunks(
            first.filter((F.col("id") >= lo) & (F.col("id") < lo + 10)),
            partition_buckets=2,
        )

    def _count(t):
        return len(glob.glob(f"{ws._tbl(t)}/_bucket=*/*.parquet"))

    lsh_before, ivf_before = _count("ann_lsh"), _count("ann_ivf")
    assert lsh_before > 4 and ivf_before > 4
    sig_before = {
        tuple(r) for r in ws.ann_index()[0].select("id", "table", "bucket").collect()
    }
    asg_before = _assign_set(ws.ivf_index()[0])

    out = ws.optimize(max_files_per_bucket=1)
    assert out["index_tables"]["ann_lsh"]["buckets_compacted"]
    assert out["index_tables"]["ann_ivf"]["buckets_compacted"]
    assert _count("ann_lsh") < lsh_before
    assert _count("ann_ivf") < ivf_before
    assert {
        tuple(r) for r in ws.ann_index()[0].select("id", "table", "bucket").collect()
    } == sig_before
    assert _assign_set(ws.ivf_index()[0]) == asg_before
