"""Corpus-scale embedding provider path (VERDICT r10 #4, the sibling of
test_rerank_scale.py).

make_http_embed_udf's HTTP seam in the reference's default Gemini
dialect (`gemini_api.cpp:238-273` batchEmbedContents request shape,
`570-623` response parse): one POST per Arrow batch (not per chunk —
the batched rewrite of the reference's one-in-flight loop), vectors
value-identical to the local hash-stub UDF when the server computes the
same function. The 100k-row wall/linearity sweep lives in
tools/stress_embed.py (BASELINE.md row); this is the fast regression
gate for the same seam.
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from ai_vector_database_converstion_from_pdf_spark.functions.embed import (
    hash_embed,
    make_embed_udf,
)
from ai_vector_database_converstion_from_pdf_spark.functions.providers import (
    HttpEmbedProvider,
    make_http_embed_udf,
)

SF = "/root/testdata/sf0.01"


class _EmbedMock(BaseHTTPRequestHandler):
    """batchEmbedContents mock computing the SAME deterministic
    hash_embed as the local stub UDF, so wire parity is value-checkable
    component by component."""

    post_count = 0
    text_count = 0
    # ThreadingHTTPServer handles concurrent Arrow-batch POSTs from
    # parallel UDF tasks on separate threads — unguarded += can lose
    # updates and flake the exact `texts == n` assertion (ADVICE r11;
    # same lock idiom as tools/stress_embed.py's mock)
    lock = threading.Lock()

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(n))
        assert self.path.endswith(":batchEmbedContents")
        reqs = payload.get("requests", [])
        assert all(r["model"].startswith("models/") for r in reqs)
        with type(self).lock:
            type(self).post_count += 1
            type(self).text_count += len(reqs)
        embs = [
            {"values": hash_embed(r["content"]["parts"][0]["text"])}
            for r in reqs
        ]
        body = json.dumps({"embeddings": embs}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def embed_server():
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _EmbedMock)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_gemini_embed_udf_fixture_parity_and_post_count(spark, embed_server):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    n = docs.count()
    prov = HttpEmbedProvider(
        embed_server, "hash-embed-mock", style="gemini", timeout=60.0
    )
    _EmbedMock.post_count = 0
    _EmbedMock.text_count = 0
    via_http = {
        r["doc_id"]: r["emb"]
        for r in docs.withColumn(
            "emb", make_http_embed_udf(prov)(F.col("text"))
        ).collect()
    }
    posts, texts = _EmbedMock.post_count, _EmbedMock.text_count
    via_stub = {
        r["doc_id"]: r["emb"]
        for r in docs.withColumn(
            "emb", make_embed_udf()(F.col("text"))
        ).collect()
    }
    assert len(via_http) == n
    assert texts == n  # every chunk wired exactly once
    # value parity component-by-component (both sides go through the
    # same float32 Arrow cast, so equality is exact)
    assert via_http == via_stub
    # Arrow batching: orders of magnitude fewer round trips than rows
    assert 0 < posts <= max(1, n // 100)
