"""Object-store-safe manifest commit protocol (Workspace
commit_protocol="manifest"): bucket data in immutable segment dirs, a
per-table pointer file as the atomic commit, live directories never
renamed. The rename protocol stays the local default — these tests pin
both equivalence (same results as rename) and the object-store safety
property itself (every rename touches only freshly staged bytes)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from tests.test_workspace_streaming_multimodal import _chunks_df


def _content(ws):
    rows = ws.chunks().drop("_bucket").collect()
    return sorted(tuple(r) for r in rows)


def _mk(spark, path, protocol=None, n=40, buckets=8):
    from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace

    ws = Workspace(spark, str(path), commit_protocol=protocol)
    ws.add_chunks(_chunks_df(spark, n=n), partition_buckets=buckets)
    return ws


class TestManifestLayout:
    def test_layout_pointer_and_reads(self, spark, tmp_path):
        ws = _mk(spark, tmp_path / "mws", "manifest")
        mf = ws._tbl("chunks") + "/_manifest.json"
        assert os.path.isfile(mf)
        m = json.load(open(mf))
        assert m["v"] == 1 and m["buckets"]
        # every live bucket holds segment SUBdirectories, not bare files
        for k, segs in m["buckets"].items():
            assert segs == ["seg-1"]
            seg_dir = f"{ws._tbl('chunks')}/_bucket={k}/seg-1"
            assert any(f.endswith(".parquet") for f in os.listdir(seg_dir))
        # reads work, carry the partition column, and prune on it
        rows = ws.chunks_for_doc("7").collect()
        assert len(rows) == 1 and rows[0]["doc_id"] == "7"
        plan = ws.chunks_for_doc("7")._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "_bucket" in plan

    def test_unbucketed_rejected(self, spark, tmp_path):
        from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace

        ws = Workspace(spark, str(tmp_path / "uws"), commit_protocol="manifest")
        with pytest.raises(ValueError, match="bucketed"):
            ws.add_chunks(_chunks_df(spark, n=4))

    def test_protocol_persisted_across_reopen(self, spark, tmp_path):
        from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace

        _mk(spark, tmp_path / "pws", "manifest")
        re = Workspace(spark, str(tmp_path / "pws"))  # no ctor arg
        assert re._protocol == "manifest"
        re.add_chunks(_chunks_df(spark, n=45).filter(F.col("id") >= 40),
                      partition_buckets=8)
        m = json.load(open(re._tbl("chunks") + "/_manifest.json"))
        assert m["v"] == 2  # the append committed a new pointer version
        assert re.count() == 45


class TestManifestEquivalence:
    """Same DML script against a rename workspace and a manifest
    workspace must produce identical chunk content at every step."""

    def test_dml_script_equivalence(self, spark, tmp_path):
        a = _mk(spark, tmp_path / "ren", None)
        b = _mk(spark, tmp_path / "man", "manifest")
        assert _content(a) == _content(b)

        # doc-level merge: one changed doc + one brand-new doc
        upd = _chunks_df(spark, n=42).filter(F.col("id").isin([7, 40, 41]))
        upd = upd.withColumn(
            "text", F.concat(F.lit("REVISED "), F.col("text"))
        )
        a.merge_chunks(upd)
        b.merge_chunks(upd)
        assert _content(a) == _content(b)
        assert b.chunks_for_doc("7").collect()[0]["text"].startswith("REVISED ")

        a.delete_doc("3")
        b.delete_doc("3")
        assert _content(a) == _content(b)

        a.boost_entry(11, 0.25, doc_id="11")
        b.boost_entry(11, 0.25, doc_id="11")
        a.compact_boosts()
        b.compact_boosts()
        assert _content(a) == _content(b)

        a.optimize(max_files_per_bucket=1)
        b.optimize(max_files_per_bucket=1)
        assert _content(a) == _content(b)

    def test_untouched_buckets_not_rewritten(self, spark, tmp_path):
        ws = _mk(spark, tmp_path / "tws", "manifest")
        root = ws._tbl("chunks")
        m0 = json.load(open(root + "/_manifest.json"))
        affected = ws._doc_buckets(["7"], 8)
        before = {
            k: sorted(segs) for k, segs in m0["buckets"].items()
        }
        ws.delete_doc("7")
        m1 = json.load(open(root + "/_manifest.json"))
        for k, segs in m1["buckets"].items():
            if int(k) in affected:
                assert segs != before.get(k)
            else:
                assert segs == before[k]  # pointer untouched
                for s in segs:  # and the bytes untouched
                    d = f"{root}/_bucket={k}/{s}"
                    assert os.path.isdir(d)


class TestObjectStoreSafety:
    def test_live_dirs_never_renamed(self, spark, tmp_path):
        """THE property that makes the protocol object-store-safe: every
        rename's source is a staging path (fresh bytes being installed);
        live bucket directories are never moved, parked, or replaced."""
        from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace

        ws = Workspace(spark, str(tmp_path / "ows"), commit_protocol="manifest")
        renames = []
        real_rename = ws._fs.rename

        class Spy:
            def __getattr__(self, a):
                return getattr(ws.__dict__["_fs_real"], a)

            def rename(self, src, dst):
                renames.append((src, dst))
                real_rename(src, dst)

        ws.__dict__["_fs_real"] = ws._fs
        ws._fs = Spy()

        ws.add_chunks(_chunks_df(spark, n=30), partition_buckets=4)
        ws.merge_chunks(
            _chunks_df(spark, n=5).withColumn(
                "text", F.concat(F.lit("v2 "), F.col("text"))
            )
        )
        ws.delete_doc("2")
        ws.optimize(max_files_per_bucket=1)
        assert renames, "expected staged-segment installs"
        for src, dst in renames:
            # metadata KV is the only rename-committed table (tiny,
            # unbucketed, documented) — all other renames move staged
            # NEW data; a live chunk/index directory is never renamed
            if "workspace_metadata" in src or "workspace_metadata" in dst:
                continue
            assert "_stage" in src, (src, dst)
            assert "/chunks/" in dst or "/ann_" in dst or "/doc_rollup/" in dst, (
                src,
                dst,
            )

    def test_copy_semantics_rename_still_correct(self, spark, tmp_path):
        """Simulate an object store where rename = copy + delete (no
        atomicity): because the protocol only ever renames staged NEW
        data and commits via the pointer file, results are unchanged."""
        from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace

        ws = Workspace(spark, str(tmp_path / "cws"), commit_protocol="manifest")
        fs = ws._fs

        class CopyRename:
            def __getattr__(self, a):
                return getattr(ws.__dict__["_fs_real"], a)

            def rename(self, src, dst):
                import shutil

                if os.path.isdir(src):
                    shutil.copytree(src, dst)
                    shutil.rmtree(src)
                else:
                    shutil.copy2(src, dst)
                    os.remove(src)

        ws.__dict__["_fs_real"] = fs
        ws._fs = CopyRename()

        ws.add_chunks(_chunks_df(spark, n=20), partition_buckets=4)
        ws.delete_doc("5")
        ws.merge_chunks(
            _chunks_df(spark, n=3).withColumn(
                "text", F.concat(F.lit("v2 "), F.col("text"))
            )
        )
        got = {
            r["doc_id"]: r["text"] for r in ws.chunks().collect()
        }
        assert "5" not in got and len(got) == 19
        assert got["1"].startswith("v2 ")

    def test_crash_garbage_invisible_and_vacuumed(self, spark, tmp_path):
        ws = _mk(spark, tmp_path / "gws", "manifest", n=20, buckets=4)
        before = _content(ws)
        root = ws._tbl("chunks")
        # simulate a crashed install: an orphan segment (pointer never
        # advanced) and a staging leftover
        k = sorted(os.listdir(root))
        bdir = next(d for d in k if d.startswith("_bucket="))
        orphan = f"{root}/{bdir}/seg-99"
        os.makedirs(orphan)
        src_seg = f"{root}/{bdir}/seg-1"
        for f in os.listdir(src_seg):
            if f.endswith(".parquet"):
                import shutil

                shutil.copy2(f"{src_seg}/{f}", f"{orphan}/{f}")
        os.makedirs(f"{ws.path}/_chunks_stage/_bucket=0", exist_ok=True)
        # reads are pointer-driven: the orphan is invisible
        assert _content(ws) == before
        rep = ws.vacuum()
        assert any("seg-99" in r for r in rep["removed"])
        assert "_chunks_stage" in rep["removed"]
        assert not os.path.isdir(orphan)
        assert _content(ws) == before

    def test_snapshot_restore_carries_manifest(self, spark, tmp_path):
        ws = _mk(spark, tmp_path / "sws", "manifest", n=20, buckets=4)
        before = _content(ws)
        ws.snapshot("t0")
        ws.delete_doc("4")
        assert _content(ws) != before
        ws.restore("t0")
        assert _content(ws) == before


class TestManifestIndexMaintenance:
    def test_ann_index_maintained_under_manifest(self, spark, tmp_path):
        ws = _mk(spark, tmp_path / "iws", "manifest", n=30, buckets=4)
        n = ws.build_ann_index(dim=16)
        assert n > 0
        assert os.path.isfile(ws._tbl("ann_lsh") + "/_manifest.json")
        ws.delete_doc("9")
        sigs, *_ = ws.ann_index()
        assert sigs.filter(F.col("doc_id") == "9").count() == 0
        # index row count tracks the chunk count through DML
        ws.merge_chunks(
            _chunks_df(spark, n=32).filter(F.col("id") >= 30),
            )
        assert ws.count() == 31
        sigs2, *_ = ws.ann_index()
        n_tables = int(ws.get_metadata("ann_params").split(",")[2])
        assert sigs2.count() == 31 * n_tables
