"""Embedding provider at corpus scale (VERDICT r10 #4, the sibling of
tools/stress_rerank.py): drive >= 100k chunks through
functions/providers.make_http_embed_udf against a local mock
batchEmbedContents server (the reference's default Gemini dialect,
`gemini_api.cpp:238-273` request shape / `570-623` response parse) and
record

- wall time at 25k / 50k / 100k texts (linearity check),
- HTTP round trips (one POST per Arrow batch, never per chunk — the
  batched rewrite of the reference's one-in-flight QNetworkReply loop),
- wire parity (HTTP vectors == the local hash-stub UDF's: the mock
  computes functions/embed.hash_embed server-side, so a checksum over
  every component must agree exactly).

Usage: python tools/stress_embed.py [--src /tmp/sf1]
(text pool = documents table unioned with one id-shifted copy)
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, "/root/repo")


class _EmbedMock(BaseHTTPRequestHandler):
    """batchEmbedContents mock: deterministic hash_embed per request
    text — same function the local stub UDF applies, so distributed
    HTTP output is byte-comparable to the stub path."""

    post_count = 0
    text_count = 0
    lock = threading.Lock()

    def do_POST(self):
        from ai_vector_database_converstion_from_pdf_spark.functions.embed import (
            hash_embed,
        )

        n = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(n))
        reqs = payload.get("requests", [])
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/sf1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ai_vector_database_converstion_from_pdf_spark.functions.embed import (
        make_embed_udf,
    )
    from ai_vector_database_converstion_from_pdf_spark.functions.providers import (
        HttpEmbedProvider,
        make_http_embed_udf,
    )
    from ai_vector_database_converstion_from_pdf_spark.session import get_spark

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _EmbedMock)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    endpoint = f"http://127.0.0.1:{httpd.server_address[1]}"
    provider = HttpEmbedProvider(
        endpoint, "hash-embed-mock", style="gemini", timeout=120.0
    )
    http_udf = make_http_embed_udf(provider)
    stub_udf = make_embed_udf()

    spark = get_spark("stress-embed")
    docs = spark.read.parquet(f"{args.src}/documents.parquet").select(
        "doc_id", "text"
    )
    pool = docs.unionByName(
        docs.select((F.col("doc_id") + 100_000_000).alias("doc_id"), "text")
    ).persist()
    total = pool.count()
    print(f"text pool: {total} rows from {args.src}")

    # checksum: sum over every vector component, rounded — exact parity
    # because mock and stub run the identical float pipeline
    def checksum(df, udf):
        return (
            df.select(udf(F.col("text")).alias("v"))
            .select(
                F.aggregate(
                    "v", F.lit(0.0), lambda acc, x: acc + x.cast("double")
                ).alias("s")
            )
            .agg(F.sum("s"))
            .first()[0]
        )

    results = {}
    for n in (25_000, 50_000, 100_000):
        cand = pool.limit(n).persist()
        cand.count()  # materialize input before the clock starts
        _EmbedMock.post_count = 0
        _EmbedMock.text_count = 0
        t0 = time.perf_counter()
        s_http = checksum(cand, http_udf)
        dt_http = time.perf_counter() - t0
        posts, texts = _EmbedMock.post_count, _EmbedMock.text_count
        t0 = time.perf_counter()
        s_stub = checksum(cand, stub_udf)
        dt_stub = time.perf_counter() - t0
        parity = abs(s_http - s_stub) < 1e-6
        results[n] = (dt_http, dt_stub, posts, parity)
        print(
            f"STRESS embed n={n}: http={dt_http:.2f}s stub={dt_stub:.2f}s "
            f"posts={posts} ({n / max(posts, 1):.0f} texts/POST, "
            f"{texts} texts wired) "
            f"parity={'OK' if parity else f'FAIL {s_http} vs {s_stub}'}"
        )
        cand.unpersist()

    r50, r100 = results[50_000][0], results[100_000][0]
    print(f"linearity http 100k/50k = {r100 / r50:.2f}x (2.0 = perfectly linear)")
    httpd.shutdown()


if __name__ == "__main__":
    main()
