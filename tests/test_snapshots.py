"""Workspace snapshots: zero-copy SHALLOW CLONE + RESTORE analog."""

import os

import pytest
from pyspark.sql import functions as F

from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace


def _chunk_rows(spark, ids, dim=8):
    rows = [
        (
            i,
            i,
            "src",
            1,
            0,
            f"text number {i} with some words",
            [float(i % 7)] * dim,
            "stub",
            dim,
            "",
            0,
            "paragraph",
            1,
            None,
            0,
            1.0,
        )
        for i in ids
    ]
    return spark.createDataFrame(
        rows,
        "id long, doc_id long, source_file string, page_num int, chunk_idx int, "
        "text string, embedding array<float>, model_sig string, model_dim int, "
        "heading_path string, heading_level int, chunk_type string, "
        "sentence_count int, list_type string, list_length int, boost_factor double",
    ).withColumn("created_at", F.current_timestamp())


def _content(ws):
    return sorted(
        (r.id, r.text) for r in ws.chunks().select("id", "text").collect()
    )


class TestSnapshots:
    def test_restore_rolls_back_dml(self, spark, tmp_path):
        ws = Workspace(spark, str(tmp_path / "ws"))
        ws.add_chunks(_chunk_rows(spark, range(10)), partition_buckets=4)
        before = _content(ws)
        info = ws.snapshot("v1")
        assert "chunks" in info["tables"]

        # mutate in every direction: append, upsert, delete
        ws.add_chunks(_chunk_rows(spark, range(100, 105)), partition_buckets=4)
        ws.merge_chunks(
            _chunk_rows(spark, [3]).withColumn("text", F.lit("REPLACED"))
        )
        ws.delete_doc(7)
        assert _content(ws) != before

        out = ws.restore("v1")
        assert "chunks" in out["restored"]
        assert _content(ws) == before
        # restore again later still works (snapshot untouched)
        ws.delete_doc(1)
        ws.restore("v1")
        assert _content(ws) == before

    def test_restore_drops_tables_created_after(self, spark, tmp_path):
        ws = Workspace(spark, str(tmp_path / "ws2"))
        ws.add_chunks(_chunk_rows(spark, range(6)), partition_buckets=2)
        ws.snapshot("base")
        ws.enable_doc_rollup()
        assert ws._exists("doc_rollup")
        out = ws.restore("base")
        assert "doc_rollup" in out["dropped"]
        assert not ws._exists("doc_rollup")

    def test_snapshot_is_hardlinked_not_copied(self, spark, tmp_path):
        root = str(tmp_path / "ws3")
        ws = Workspace(spark, root)
        ws.add_chunks(_chunk_rows(spark, range(8)), partition_buckets=2)
        ws.snapshot("z")
        snap_dir = os.path.join(root, "_snapshots", "z", "chunks")
        linked = 0
        for r, _d, files in os.walk(snap_dir):
            for f in files:
                if f.endswith(".parquet"):
                    assert os.stat(os.path.join(r, f)).st_nlink >= 2
                    linked += 1
        assert linked > 0

    def test_snapshot_survives_source_mutation(self, spark, tmp_path):
        """The inode-sharing claim: delete the live doc, the snapshot's
        files still read fine (the unlink removed a name, not the data)."""
        ws = Workspace(spark, str(tmp_path / "ws4"))
        ws.add_chunks(_chunk_rows(spark, range(8)), partition_buckets=2)
        before = _content(ws)
        ws.snapshot("keep")
        for d in range(7):
            ws.delete_doc(d)
        assert _content(ws) == [(7, "text number 7 with some words")]
        ws.restore("keep")
        assert _content(ws) == before

    def test_tag_hygiene_and_listing(self, spark, tmp_path):
        ws = Workspace(spark, str(tmp_path / "ws5"))
        ws.add_chunks(_chunk_rows(spark, range(3)))
        with pytest.raises(ValueError):
            ws.snapshot("../escape")
        ws.snapshot("a")
        ws.snapshot("b")
        with pytest.raises(ValueError):
            ws.snapshot("a")  # duplicate
        assert ws.list_snapshots() == ["a", "b"]
        ws.drop_snapshot("a")
        assert ws.list_snapshots() == ["b"]
        with pytest.raises(ValueError):
            ws.restore("a")

    def test_history_records_snapshot_and_restore(self, spark, tmp_path):
        ws = Workspace(spark, str(tmp_path / "ws6"))
        ws.add_chunks(_chunk_rows(spark, range(3)))
        ws.snapshot("s")
        ws.restore("s")
        ops = [r.op for r in ws.history().collect()]
        assert ops[0] == "restore"
        assert "snapshot:s" in ops


def test_cli_snapshot_lifecycle(spark, capsys, tmp_path):
    import json

    from ai_vector_database_converstion_from_pdf_spark import cli

    def run(argv):
        cli.main(argv + ["--asof", "2024-06-01 00:00:00"])
        out = capsys.readouterr().out.strip().splitlines()
        return [json.loads(line) for line in out]

    ws = str(tmp_path / "cli_snap")
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "d.parquet")
    docs.write.parquet(src)
    run(["index-text", "-w", ws, "--dim", "16", "--parquet", src])
    got = run(["snapshot", "-w", ws, "create", "--tag", "v1"])
    assert "chunks" in got[0]["tables"]
    assert run(["snapshot", "-w", ws, "list"])[0]["snapshots"] == ["v1"]
    # mutate, then roll back through the CLI
    docs2 = spark.createDataFrame([(3, "eta theta iota")], "doc_id long, text string")
    src2 = str(tmp_path / "d2.parquet")
    docs2.write.parquet(src2)
    run(["index-text", "-w", ws, "--dim", "16", "--parquet", src2])
    # diff against live: doc 3's chunks are additions since v1
    got = run(["snapshot", "-w", ws, "diff", "--tag", "v1"])
    assert got[0]["against"] == "live"
    assert got[0]["counts"] == {"added": 1}
    got = run(["snapshot", "-w", ws, "restore", "--tag", "v1"])
    assert "chunks" in got[0]["restored"]
    from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace

    assert Workspace(spark, ws).count() == 2
    # post-restore the diff is empty
    got = run(["snapshot", "-w", ws, "diff", "--tag", "v1"])
    assert got[0]["counts"] == {}
    run(["snapshot", "-w", ws, "drop", "--tag", "v1"])
    assert run(["snapshot", "-w", ws, "list"])[0]["snapshots"] == []


class TestSnapshotDiff:
    def test_diff_vs_live_after_dml(self, spark, tmp_path):
        """added/removed/changed between a snapshot and the live table —
        one id-keyed full-outer join over (id, doc_id, md5) projections."""
        ws = Workspace(spark, str(tmp_path / "wsd"))
        ws.add_chunks(_chunk_rows(spark, range(8)), partition_buckets=2)
        ws.snapshot("v1")
        ws.add_chunks(_chunk_rows(spark, [100, 101]), partition_buckets=2)
        ws.merge_chunks(
            _chunk_rows(spark, [3]).withColumn("text", F.lit("REPLACED"))
        )
        ws.delete_doc(5)
        out = {
            (r["id"], r["status"]) for r in ws.snapshot_diff("v1").collect()
        }
        assert out == {
            (100, "added"),
            (101, "added"),
            (3, "changed"),
            (5, "removed"),
        }

    def test_diff_between_two_snapshots_and_identity(self, spark, tmp_path):
        ws = Workspace(spark, str(tmp_path / "wsd2"))
        ws.add_chunks(_chunk_rows(spark, range(5)), partition_buckets=2)
        ws.snapshot("a")
        ws.delete_doc(2)
        ws.add_chunks(_chunk_rows(spark, [50]), partition_buckets=2)
        ws.snapshot("b")
        out = {
            (r["id"], r["status"])
            for r in ws.snapshot_diff("a", "b").collect()
        }
        assert out == {(2, "removed"), (50, "added")}
        # a snapshot diffed against itself is empty (unchanged filtered)
        assert ws.snapshot_diff("a", "a").count() == 0

    def test_null_text_change_is_detected(self, spark, tmp_path):
        """md5(NULL) is NULL and a plain != against NULL is SQL NULL —
        the diff must use a null-SAFE comparison or a chunk whose text
        changed to/from NULL silently reads as unchanged."""
        ws = Workspace(spark, str(tmp_path / "wsd4"))
        base = _chunk_rows(spark, range(3))
        ws.add_chunks(
            base.withColumn(
                "text",
                F.when(F.col("id") == 1, F.lit(None)).otherwise(F.col("text")),
            ),
            partition_buckets=2,
        )
        ws.snapshot("v1")
        # id 1: NULL -> real text; id 2: real text -> NULL
        ws.merge_chunks(
            base.filter(F.col("id").isin([1, 2])).withColumn(
                "text",
                F.when(F.col("id") == 2, F.lit(None)).otherwise(F.col("text")),
            )
        )
        out = {
            (r["id"], r["status"]) for r in ws.snapshot_diff("v1").collect()
        }
        assert out == {(1, "changed"), (2, "changed")}

    def test_diff_unknown_tag_raises(self, spark, tmp_path):
        ws = Workspace(spark, str(tmp_path / "wsd3"))
        ws.add_chunks(_chunk_rows(spark, range(2)), partition_buckets=2)
        with pytest.raises(ValueError, match="no snapshot"):
            ws.snapshot_diff("nope").count()
