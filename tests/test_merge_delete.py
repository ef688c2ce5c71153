"""Bucket-scoped MERGE/DELETE (reference row UPDATE/DELETE,
`vector_store.cpp:789-795`): upserting or deleting a document on a
hash-bucketed workspace must rewrite ONLY the bucket directories the
touched doc_ids hash to — every other bucket's files stay byte-for-byte
untouched (the property that makes updates viable at 100 TB)."""

import pytest
from pyspark.sql import functions as F

from ai_vector_database_converstion_from_pdf_spark.engine import PvdbEngine
from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace
from tests.test_workspace_streaming_multimodal import _chunks_df
from tools.fswalk import snapshot as _snapshot


def _bucket_of(ws, doc_id):
    return ws._doc_buckets([doc_id], int(ws.get_metadata("partition_buckets")))[0]


def test_merge_rewrites_only_touched_buckets(spark, tmp_path):
    ws = Workspace(spark, str(tmp_path / "m1"))
    ws.add_chunks(_chunks_df(spark, n=40), partition_buckets=8)
    before = _snapshot(ws._tbl("chunks"))
    k = _bucket_of(ws, "7")

    updates = (
        _chunks_df(spark, n=40)
        .filter(F.col("doc_id") == "7")
        .withColumn("text", F.lit("REWRITTEN BODY"))
    )
    ws.merge_chunks(updates)

    # content: the row changed, the count did not
    assert ws.count() == 40
    assert ws.chunks_for_doc("7").collect()[0]["text"] == "REWRITTEN BODY"

    # physics: only files under _bucket=<k> changed
    after = _snapshot(ws._tbl("chunks"))
    touched_before = {p: v for p, v in before.items() if p.startswith(f"_bucket={k}/")}
    touched_after = {p: v for p, v in after.items() if p.startswith(f"_bucket={k}/")}
    rest_before = {p: v for p, v in before.items() if not p.startswith(f"_bucket={k}/")}
    rest_after = {p: v for p, v in after.items() if not p.startswith(f"_bucket={k}/")}
    assert rest_before == rest_after
    assert touched_before != touched_after

    # pruned reads still work after the swap
    plan = ws.chunks_for_doc("7")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_bucket" in plan


def test_merge_inserts_unmatched_rows(spark, tmp_path):
    ws = Workspace(spark, str(tmp_path / "m2"))
    ws.add_chunks(_chunks_df(spark, n=10), partition_buckets=4)
    inserts = (
        _chunks_df(spark, n=1)
        .withColumn("id", F.lit(999).cast("long"))
        .withColumn("doc_id", F.lit("999"))
        .withColumn("text", F.lit("fresh document"))
    )
    ws.merge_chunks(inserts)
    assert ws.count() == 11
    assert ws.chunks_for_doc("999").collect()[0]["text"] == "fresh document"


def test_merge_rejects_mixed_dimensions(spark, tmp_path):
    ws = Workspace(spark, str(tmp_path / "m3"))
    ws.add_chunks(_chunks_df(spark, n=10), partition_buckets=4)
    bad = _chunks_df(spark, n=2, dim=8)
    with pytest.raises(ValueError):
        ws.merge_chunks(bad)


def test_delete_doc_rewrites_one_bucket(spark, tmp_path):
    ws = Workspace(spark, str(tmp_path / "d1"))
    ws.add_chunks(_chunks_df(spark, n=40), partition_buckets=8)
    before = _snapshot(ws._tbl("chunks"))
    k = _bucket_of(ws, "7")

    ws.delete_doc("7")
    assert ws.count() == 39
    assert ws.chunks_for_doc("7").count() == 0

    after = _snapshot(ws._tbl("chunks"))
    rest_before = {p: v for p, v in before.items() if not p.startswith(f"_bucket={k}/")}
    rest_after = {p: v for p, v in after.items() if not p.startswith(f"_bucket={k}/")}
    assert rest_before == rest_after


def test_unbucketed_merge_and_delete_fallback(spark, tmp_path):
    ws = Workspace(spark, str(tmp_path / "u1"))
    ws.add_chunks(_chunks_df(spark, n=10))
    updates = (
        _chunks_df(spark, n=10)
        .filter(F.col("doc_id") == "3")
        .withColumn("text", F.lit("patched"))
    )
    ws.merge_chunks(updates)
    assert ws.count() == 10
    assert ws.chunks_for_doc("3").collect()[0]["text"] == "patched"
    ws.delete_doc("3")
    assert ws.count() == 9


def test_compact_boosts_is_bucket_scoped(spark, tmp_path):
    ws = Workspace(spark, str(tmp_path / "c1"))
    ws.add_chunks(_chunks_df(spark, n=40), partition_buckets=8)
    ws.boost_entry(7, 0.1)
    ws.boost_entry(7, 0.1)
    before = _snapshot(ws._tbl("chunks"))
    k = _bucket_of(ws, "7")

    ws.compact_boosts()

    # effective boost is now stored, delta table gone
    assert not ws._exists("boosts")
    assert abs(ws.chunks_for_doc("7").collect()[0]["boost_factor"] - 1.2) < 1e-9

    # only the boosted chunk's bucket was rewritten
    after = _snapshot(ws._tbl("chunks"))
    rest_before = {p: v for p, v in before.items() if not p.startswith(f"_bucket={k}/")}
    rest_after = {p: v for p, v in after.items() if not p.startswith(f"_bucket={k}/")}
    assert rest_before == rest_after


def test_engine_delete_document_invalidates_cache(spark, tmp_path):
    eng = PvdbEngine(spark, str(tmp_path / "e1"), dim=32, asof="2024-06-01 00:00:00")
    rows = [(i, f"alpha beta gamma delta variant {i}") for i in range(10)]
    eng.index_documents(spark.createDataFrame(rows, "doc_id long, text string"))
    res = eng.search("alpha beta gamma delta variant 3", k=3)
    assert any(r["id"] == 3 for r in res)
    eng.delete_document("3")
    # cache was cleared: the same query re-executes and no longer cites 3
    res2 = eng.search("alpha beta gamma delta variant 3", k=3)
    assert not any(r["id"] == 3 for r in res2)


def test_clear_resets_bucket_layout(spark, tmp_path):
    ws = Workspace(spark, str(tmp_path / "cl1"))
    ws.add_chunks(_chunks_df(spark, n=8), partition_buckets=4)
    ws.clear()
    # a cleared workspace accepts a DIFFERENT layout (it's fresh)
    ws.add_chunks(_chunks_df(spark, n=8))
    assert ws.count() == 8
    assert ws.get_metadata("partition_buckets") == "0"


def test_engine_upsert_reindexes_in_place(spark, tmp_path):
    eng = PvdbEngine(spark, str(tmp_path / "up1"), dim=32, asof="2024-06-01 00:00:00")
    rows = [(i, f"alpha beta gamma delta topic {i}") for i in range(10)]
    eng.index_documents(spark.createDataFrame(rows, "doc_id long, text string"))
    # revised doc 3 arrives: upsert replaces, count stays 10
    n = eng.index_documents(
        spark.createDataFrame(
            [(3, "entirely new revised content about joins")],
            "doc_id long, text string",
        ),
        upsert=True,
    )
    assert n == 10
    txt = eng.workspace.chunks().filter(F.col("id") == 3).collect()[0]["text"]
    assert txt.startswith("entirely new revised")


def test_merge_on_fresh_workspace_logs_one_history_row(spark, tmp_path):
    """merge_chunks delegating to the append path on a fresh workspace
    is ONE logical mutation: one `_history` row (op=merge_chunks), not a
    second add_chunks row (ADVICE r2 low #4)."""
    ws = Workspace(spark, str(tmp_path / "m_hist"))
    ws.merge_chunks(_chunks_df(spark, n=6))
    ops = [r["op"] for r in ws.history().collect()]
    assert ops == ["merge_chunks"]
    assert ws.count() == 6


def test_merge_dedupes_within_batch(spark, tmp_path):
    ws = Workspace(spark, str(tmp_path / "wb1"))
    ws.add_chunks(_chunks_df(spark, n=10), partition_buckets=4)
    one = _chunks_df(spark, n=1).withColumn("text", F.lit("twice-delivered"))
    ws.merge_chunks(one.unionByName(one))  # same row twice in ONE batch
    assert ws.count() == 10
    assert ws.chunks().filter(F.col("text") == "twice-delivered").count() == 1


def test_merge_replaces_whole_document_even_when_it_shrinks(spark, tmp_path):
    """Doc-level replace: a revision with FEWER chunks must leave no
    stale survivors from the previous version."""
    ws = Workspace(spark, str(tmp_path / "sh1"))
    base = _chunks_df(spark, n=6)
    # give doc "2" a second chunk (id 902) so v1 has 2 chunks
    extra = (
        _chunks_df(spark, n=3)
        .filter(F.col("doc_id") == "2")
        .withColumn("id", F.lit(902).cast("long"))
        .withColumn("chunk_idx", F.lit(1))
    )
    ws.add_chunks(base.unionByName(extra), partition_buckets=4)
    assert ws.chunks_for_doc("2").count() == 2

    # revision v2: ONE chunk only (id 2), newer created_at
    rev = (
        _chunks_df(spark, n=3)
        .filter(F.col("doc_id") == "2")
        .withColumn("text", F.lit("v2 single chunk"))
        .withColumn("created_at", F.lit("2024-02-01 00:00:00").cast("timestamp"))
    )
    ws.merge_chunks(rev)
    rows = ws.chunks_for_doc("2").collect()
    assert len(rows) == 1  # stale id-902 chunk is GONE
    assert rows[0]["text"] == "v2 single chunk"
    assert ws.count() == 6  # 7 before merge (6+extra), doc 2: 2 -> 1


def test_merge_latest_created_at_wins_within_batch(spark, tmp_path):
    """Two versions of the same chunk in ONE batch: the newer
    created_at must deterministically win."""
    ws = Workspace(spark, str(tmp_path / "lw1"))
    ws.add_chunks(_chunks_df(spark, n=5), partition_buckets=4)
    v1 = (
        _chunks_df(spark, n=1)
        .withColumn("text", F.lit("stale v1"))
        .withColumn("created_at", F.lit("2024-01-01 00:00:00").cast("timestamp"))
    )
    v2 = (
        _chunks_df(spark, n=1)
        .withColumn("text", F.lit("fresh v2"))
        .withColumn("created_at", F.lit("2024-03-01 00:00:00").cast("timestamp"))
    )
    ws.merge_chunks(v1.unionByName(v2))  # v1 listed FIRST
    rows = ws.chunks_for_doc("0").collect()
    assert len(rows) == 1 and rows[0]["text"] == "fresh v2"


def test_compact_with_doc_id_carrying_boosts(spark, tmp_path):
    """Deltas that carry doc_id let compaction find buckets from the
    boosts table alone; values must match the scan fallback exactly."""
    ws = Workspace(spark, str(tmp_path / "bd1"))
    ws.add_chunks(_chunks_df(spark, n=40), partition_buckets=8)
    ws.boost_entry(7, 0.1, doc_id="7")
    ws.boost_entry(7, 0.2, doc_id="7")
    before = _snapshot(ws._tbl("chunks"))
    k = _bucket_of(ws, "7")
    ws.compact_boosts()
    assert abs(ws.chunks_for_doc("7").collect()[0]["boost_factor"] - 1.3) < 1e-9
    after = _snapshot(ws._tbl("chunks"))
    rest_b = {p: v for p, v in before.items() if not p.startswith(f"_bucket={k}/")}
    rest_a = {p: v for p, v in after.items() if not p.startswith(f"_bucket={k}/")}
    assert rest_b == rest_a


def test_optimize_compacts_fragmented_buckets(spark, tmp_path):
    """Repeated merges fragment a bucket into many small files; optimize
    must bin-pack ONLY the over-cap buckets to one file each, preserve
    row content exactly, and leave under-cap buckets byte-identical."""
    ws = Workspace(spark, str(tmp_path / "opt1"))
    ws.add_chunks(_chunks_df(spark, n=40), partition_buckets=8)
    k = _bucket_of(ws, "7")
    # fragment doc 7's bucket: each APPEND lands >=1 new file there
    # (merges don't fragment — their bucket swap already consolidates)
    base = _chunks_df(spark, n=40).filter(F.col("doc_id") == "7")
    for i in range(5):
        ws.add_chunks(
            base.withColumn("id", F.col("id") + F.lit(1000 * (i + 1))),
            partition_buckets=8,
        )

    before_rows = sorted(
        ws.chunks().collect(), key=lambda r: (r["doc_id"], r["id"])
    )
    before = _snapshot(ws._tbl("chunks"))

    stats = ws.optimize(max_files_per_bucket=4)
    assert k in stats["buckets_compacted"]
    assert stats["files_after"] < stats["files_before"]

    # content identical (boosts not folded, rows exact)
    after_rows = sorted(
        ws.chunks().collect(), key=lambda r: (r["doc_id"], r["id"])
    )
    assert before_rows == after_rows

    # untouched buckets byte-identical
    untouched = set(str(b) for b in range(8)) - set(
        str(b) for b in stats["buckets_compacted"]
    )
    for b in untouched:
        pre = {p: v for p, v in before.items() if p.startswith(f"_bucket={b}/")}
        post = {
            p: v
            for p, v in _snapshot(ws._tbl("chunks")).items()
            if p.startswith(f"_bucket={b}/")
        }
        assert pre == post

    # each compacted bucket now holds exactly one parquet file
    import os

    for b in stats["buckets_compacted"]:
        d = os.path.join(ws._tbl("chunks"), f"_bucket={b}")
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1

    # compacted files are CLUSTERED by (doc_id, chunk_idx) — parquet
    # min/max stats then row-group-prune doc point reads (r3)
    for b in stats["buckets_compacted"]:
        d = os.path.join(ws._tbl("chunks"), f"_bucket={b}")
        f = [x for x in os.listdir(d) if x.endswith(".parquet")][0]
        rows = spark.read.parquet(os.path.join(d, f)).select(
            "doc_id", "chunk_idx"
        ).collect()
        keys = [(r["doc_id"], r["chunk_idx"]) for r in rows]
        assert keys == sorted(keys)

    # idempotent: second optimize is a no-op
    again = ws.optimize(max_files_per_bucket=4)
    assert again["buckets_compacted"] == []


def test_optimize_unbucketed_and_empty(spark, tmp_path):
    ws = Workspace(spark, str(tmp_path / "opt2"))
    assert ws.optimize()["buckets_compacted"] == []
    ws.add_chunks(_chunks_df(spark, n=6).repartition(6))
    stats = ws.optimize(max_files_per_bucket=2)
    assert stats["buckets_compacted"] == [-1]
    assert stats["files_after"] <= 2
    assert ws.count() == 6


def test_vacuum_removes_only_crash_leftovers(spark, tmp_path):
    """vacuum() must delete tmp/old version dirs when the live table
    exists, keep them (as recovery material) when it doesn't, and never
    touch live tables."""
    import os

    ws = Workspace(spark, str(tmp_path / "ws_vac"))
    ws.add_chunks(_chunks_df(spark, n=20), partition_buckets=4)
    before = ws.count()

    # simulate a crash: leftover tmp + displaced bucket version
    os.makedirs(ws._tbl("_chunks_tmp/_bucket=0"), exist_ok=True)
    os.makedirs(ws._tbl("_chunks_old_bucket_2"), exist_ok=True)
    # and an orphan whose live table is gone
    os.makedirs(ws._tbl("_ghost_old"), exist_ok=True)

    out = ws.vacuum()
    assert sorted(out["removed"]) == ["_chunks_old_bucket_2", "_chunks_tmp"]
    assert out["kept"] == ["_ghost_old"]
    assert os.path.isdir(ws._tbl("_ghost_old"))  # refused: recovery material
    assert ws.count() == before  # live data untouched
    # idempotent: second run finds nothing new to remove
    assert ws.vacuum()["removed"] == []


def test_history_logs_mutations_and_survives_clear(spark, tmp_path):
    """Every mutator appends one history row (after commit, monotone
    versions); clear() wipes data tables but keeps the audit trail."""
    ws = Workspace(spark, str(tmp_path / "ws_hist"))
    ws.add_chunks(_chunks_df(spark, n=10), partition_buckets=4)
    ws.boost_entry(1, 0.1)
    ws.optimize()
    ws.clear()
    ops = [r["op"] for r in ws.history().collect()]
    assert ops[0] == "clear"  # newest first
    assert ops[::-1] == ["add_chunks", "boost_entry", "optimize", "clear"]
    versions = [r["version"] for r in ws.history().orderBy("version").collect()]
    assert versions == [0, 1, 2, 3]
    # cleared workspace: data gone, history intact, next ops keep counting
    assert not ws._exists("chunks")
    ws.add_chunks(_chunks_df(spark, n=5), partition_buckets=2)
    assert [r["op"] for r in ws.history().collect()][0] == "add_chunks"
    assert ws.history().count() == 5
