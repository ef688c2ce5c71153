"""Corpus-scale rerank path (VERDICT r8 #7 / r9 #5).

batch_score's HTTP seam: one /v1/rerank POST per Arrow batch (not per
candidate), scores byte-identical to the local stub when the server
computes the same function, and cross-batch calibration state identical
to the sequential reference loop (`gemini_api.cpp:22-69`) over the same
score stream.
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from ai_vector_database_converstion_from_pdf_spark.operators.rerank import (
    PREFIX_CHARS,
    Calibrator,
    batch_score,
    stub_score,
)

SF = "/root/testdata/sf0.01"
QUERY = "how to merge fast table join"


class _ScoreMock(BaseHTTPRequestHandler):
    """Mock cross-encoder server computing the SAME deterministic
    function as the local stub, so wire parity is value-checkable."""

    post_count = 0

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(n))
        assert self.path == "/v1/rerank"
        type(self).post_count += 1
        results = [
            {"index": i, "relevance_score": stub_score(payload["query"], d)}
            for i, d in enumerate(payload["documents"])
        ]
        body = json.dumps({"results": results}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def score_server():
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _ScoreMock)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_http_batch_score_matches_stub_per_batch_posts(spark, score_server):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    n = docs.count()
    _ScoreMock.post_count = 0
    via_http = {
        r["doc_id"]: r["rerank_raw"]
        for r in batch_score(
            docs, QUERY, endpoint=score_server, model="bge-reranker"
        ).collect()
    }
    posts = _ScoreMock.post_count
    via_stub = {
        r["doc_id"]: r["rerank_raw"] for r in batch_score(docs, QUERY).collect()
    }
    assert via_http == via_stub and len(via_http) == n
    # Arrow batching: orders of magnitude fewer round trips than rows
    assert 0 < posts <= max(1, n // 100)


def test_calibration_state_matches_sequential_reference(spark):
    """Distributed scoring + driver-side batch calibration == the
    reference's sequential score-then-update loop over the same texts
    in the same order (same batches, same EMA trajectory)."""
    rows = (
        batch_score(
            spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text"),
            QUERY,
        )
        .select("doc_id", "text", "rerank_raw")
        .orderBy("doc_id")
        .collect()
    )
    batch = 100
    cal_dist = Calibrator()
    for i in range(0, len(rows), batch):
        chunk = [r["rerank_raw"] for r in rows[i : i + batch]]
        if cal_dist.check_consistency(chunk):
            cal_dist.update_stats(chunk)
        else:
            cal_dist.anomalies.append("frozen-model")

    cal_seq = Calibrator()
    for i in range(0, len(rows), batch):
        chunk = [
            stub_score(QUERY, (r["text"] or "")[:PREFIX_CHARS])
            for r in rows[i : i + batch]
        ]
        if cal_seq.check_consistency(chunk):
            cal_seq.update_stats(chunk)
        else:
            cal_seq.anomalies.append("frozen-model")

    assert (cal_dist.mean, cal_dist.std, cal_dist.sample_count, cal_dist.anomalies) == (
        cal_seq.mean, cal_seq.std, cal_seq.sample_count, cal_seq.anomalies
    )
    assert cal_dist.sample_count > 0
