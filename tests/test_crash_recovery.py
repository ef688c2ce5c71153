"""Crash recovery for the versioned bucket-swap protocol: a rename
failure INSIDE a swap (the narrowest crash window) must never lose data
— the parked pre-operation copy survives, vacuum refuses to collect it,
mutation refuses to proceed over it, and recover() restores it. Then
the failed operation retries cleanly."""

import pytest
from pyspark.sql import functions as F

from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace
from tests.test_workspace_streaming_multimodal import _chunks_df

DIM = 8


def _rows(ws):
    return {
        (r["id"], r["text"]) for r in ws.chunks(fold_boosts=False).collect()
    }


def _inject_tmp_rename_failure(monkeypatch, ws):
    """Fail the install rename (tmp -> live) — crash window between the
    two renames of a bucket swap: live dir already parked away."""
    real = ws._fs.rename

    def boom(src, dst):
        if "_chunks_tmp/" in src.replace("\\", "/"):
            raise OSError("injected crash: power loss mid-swap")
        return real(src, dst)

    monkeypatch.setattr(ws._fs, "rename", boom)
    return real


def test_mid_swap_crash_is_recoverable(spark, tmp_path, monkeypatch):
    ws = Workspace(spark, str(tmp_path / "crash_ws"))
    ws.add_chunks(_chunks_df(spark, n=30, dim=DIM), partition_buckets=8)
    pre = _rows(ws)
    k = ws._doc_buckets(["7"], 8)[0]

    upd = (
        _chunks_df(spark, n=30, dim=DIM)
        .filter(F.col("doc_id") == "7")
        .withColumn("text", F.lit("NEW VERSION"))
    )
    real = _inject_tmp_rename_failure(monkeypatch, ws)
    with pytest.raises(OSError, match="injected crash"):
        ws.merge_chunks(upd)

    # the live bucket is gone; its ONLY copy is the parked old dir
    assert not ws._fs.isdir(f"{ws._tbl('chunks')}/_bucket={k}")
    parked = ws._tbl(f"_chunks_old_bucket_{k}")
    assert ws._fs.isdir(parked)

    # vacuum must refuse to collect the recovery material (both the
    # parked copy and the tmp holding the bucket's new version)
    vac = ws.vacuum()
    assert f"_chunks_old_bucket_{k}" in vac["kept"]
    assert "_chunks_tmp" in vac["kept"]
    assert ws._fs.isdir(parked)

    # mutation over an unrecovered workspace is a loud error, not a
    # silent drop of the parked rows
    monkeypatch.setattr(ws._fs, "rename", real)
    with pytest.raises(RuntimeError, match="recover"):
        ws.merge_chunks(upd)

    # recover() rolls the crashed bucket back to its pre-operation state
    rec = ws.recover()
    assert {(r["table"], r["from"]) for r in rec["restored"]} == {("chunks", "old")}
    assert _rows(ws) == pre

    # the failed operation retries cleanly and converges
    ws.merge_chunks(upd)
    rows = _rows(ws)
    assert any(t == "NEW VERSION" for _id, t in rows)
    assert len(rows) == len(pre)  # doc-level replace, same cardinality

    # nothing left for vacuum after a clean retry
    vac = ws.vacuum()
    assert vac["kept"] == []


def test_crash_before_any_rename_leaves_live_intact(spark, tmp_path, monkeypatch):
    """Crash while WRITING tmp (before the first rename): the live table
    is untouched and vacuum can safely collect the tmp."""
    ws = Workspace(spark, str(tmp_path / "crash_pre"))
    ws.add_chunks(_chunks_df(spark, n=20, dim=DIM), partition_buckets=4)
    pre = _rows(ws)

    real = ws._fs.rename

    def boom(src, dst):
        raise OSError("injected: crash at first rename")

    upd = (
        _chunks_df(spark, n=20, dim=DIM)
        .filter(F.col("doc_id") == "3")
        .withColumn("text", F.lit("X"))
    )
    monkeypatch.setattr(ws._fs, "rename", boom)
    with pytest.raises(OSError):
        ws.merge_chunks(upd)
    monkeypatch.setattr(ws._fs, "rename", real)

    # live table complete; tmp's buckets all still exist live → removable
    assert _rows(ws) == pre
    vac = ws.vacuum()
    assert "_chunks_tmp" in vac["removed"]
    ws.merge_chunks(upd)  # retry works with no recovery step needed
    assert any(t == "X" for _id, t in _rows(ws))


def test_new_bucket_crash_completes_forward_from_tmp(spark, tmp_path, monkeypatch):
    """A brand-new bucket (first doc hashing to it) whose install rename
    crashed exists ONLY in tmp — recover() completes the swap forward."""
    ws = Workspace(spark, str(tmp_path / "crash_new"))
    base = _chunks_df(spark, n=5, dim=DIM)
    ws.add_chunks(base, partition_buckets=64)
    occupied = {
        r["_bucket"]
        for r in spark.read.parquet(ws._tbl("chunks")).select("_bucket").distinct().collect()
    }
    # find a doc id hashing to an empty bucket
    new_doc = None
    for cand in range(100, 200):
        b = ws._doc_buckets([str(cand)], 64)[0]
        if b not in occupied:
            new_doc, new_bucket = str(cand), b
            break
    assert new_doc is not None

    newrows = (
        base.limit(1)
        .withColumn("id", F.lit(int(new_doc)).cast("long"))
        .withColumn("doc_id", F.lit(new_doc))
        .withColumn("text", F.lit("FRESH DOC"))
    )
    real = _inject_tmp_rename_failure(monkeypatch, ws)
    with pytest.raises(OSError):
        ws.merge_chunks(newrows)
    monkeypatch.setattr(ws._fs, "rename", real)

    # no parked old (bucket never existed); the only copy is in tmp
    assert not ws._fs.isdir(f"{ws._tbl('chunks')}/_bucket={new_bucket}")
    vac = ws.vacuum()
    assert "_chunks_tmp" in vac["kept"]

    rec = ws.recover()
    assert {(r["table"], r["bucket"], r["from"]) for r in rec["restored"]} == {
        ("chunks", str(new_bucket), "tmp")
    }
    assert any(t == "FRESH DOC" for _id, t in _rows(ws))
    # tmp now holds nothing the live table lacks → collectable
    vac = ws.vacuum()
    assert "_chunks_tmp" in vac["removed"]
