"""Append-only boost semantics (VERDICT r1 scale fix #4): a click must
never rewrite the chunks table; effective boosts fold at read time and
compaction is value-preserving."""

import os

import pyspark.sql.functions as F

from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace


def _mk_ws(spark, tmp_path, n=6):
    ws = Workspace(spark, str(tmp_path / "ws"))
    rows = [
        (
            i, str(i), f"doc{i}.pdf", 1, 0, f"text {i}",
            [float(i), 1.0], "stub", 2, "", 0, "text", 1, "", 0, 1.0, None,
        )
        for i in range(n)
    ]
    schema = (
        "id long, doc_id string, source_file string, page_num int, chunk_idx int, "
        "text string, embedding array<double>, model_sig string, model_dim int, "
        "heading_path string, heading_level int, chunk_type string, "
        "sentence_count int, list_type string, list_length int, "
        "boost_factor double, created_at timestamp"
    )
    ws.add_chunks(spark.createDataFrame(rows, schema))
    return ws


def _chunk_files(ws):
    out = []
    for root, _dirs, files in os.walk(ws._tbl("chunks")):
        out += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
    return sorted(out)


def test_boost_appends_only(spark, tmp_path):
    ws = _mk_ws(spark, tmp_path)
    before = _chunk_files(ws)
    ws.boost_entry(3, 0.1)
    ws.boost_entry(3, 0.2)
    ws.boost_entry(5, 0.4)
    assert _chunk_files(ws) == before  # corpus untouched
    got = {
        r["id"]: r["boost_factor"]
        for r in ws.chunks().select("id", "boost_factor").collect()
    }
    assert abs(got[3] - 1.3) < 1e-9
    assert abs(got[5] - 1.4) < 1e-9
    assert abs(got[0] - 1.0) < 1e-9


def test_compact_boosts_preserves_values(spark, tmp_path):
    ws = _mk_ws(spark, tmp_path)
    ws.boost_entry(1, 0.25)
    ws.boost_entry(2, 0.5)
    before = {
        r["id"]: r["boost_factor"]
        for r in ws.chunks().select("id", "boost_factor").collect()
    }
    ws.compact_boosts()
    assert not os.path.isdir(ws._tbl("boosts"))
    after = {
        r["id"]: r["boost_factor"]
        for r in ws.chunks().select("id", "boost_factor").collect()
    }
    assert before == after
    # raw storage now carries the folded values
    raw = {
        r["id"]: r["boost_factor"]
        for r in ws.chunks(fold_boosts=False).select("id", "boost_factor").collect()
    }
    assert abs(raw[1] - 1.25) < 1e-9


def test_mixed_dimension_batch_rejected(spark, tmp_path):
    ws = Workspace(spark, str(tmp_path / "ws2"))
    rows = [
        (0, "0", "a.pdf", 1, 0, "t", [1.0, 2.0], "s", 2, "", 0, "text", 1, "", 0, 1.0, None),
        (1, "1", "b.pdf", 1, 0, "t", [1.0, 2.0, 3.0], "s", 3, "", 0, "text", 1, "", 0, 1.0, None),
    ]
    schema = (
        "id long, doc_id string, source_file string, page_num int, chunk_idx int, "
        "text string, embedding array<double>, model_sig string, model_dim int, "
        "heading_path string, heading_level int, chunk_type string, "
        "sentence_count int, list_type string, list_length int, "
        "boost_factor double, created_at timestamp"
    )
    import pytest

    with pytest.raises(ValueError, match="mixed embedding dimensions"):
        ws.add_chunks(spark.createDataFrame(rows, schema))
    # failed append must NOT have registered a dimension
    assert ws.get_metadata("embedding_dimension") is None


def test_uri_scheme_selects_hadoop_fs_backend(spark, tmp_path):
    """URI workspaces route through the Hadoop FileSystem API (r3: the
    former local-filesystem-only rejection is replaced by a real
    backend); plain paths keep the os/shutil fast path. Full URI
    lifecycle coverage lives in test_workspace_uri.py."""
    from ai_vector_database_converstion_from_pdf_spark.sinks import _HadoopFS, _LocalFS

    assert isinstance(Workspace(spark, f"file://{tmp_path}/ws")._fs, _HadoopFS)
    assert isinstance(Workspace(spark, str(tmp_path / "ws2"))._fs, _LocalFS)
