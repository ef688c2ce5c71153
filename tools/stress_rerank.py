"""Rerank at corpus scale (VERDICT r8 #7 / r9 #5): drive >= 100k
candidates through operators/rerank.batch_score against a local mock
cross-encoder server and record

- wall time at 25k / 50k / 100k candidates (linearity check),
- HTTP round trips (one POST per Arrow batch, never per candidate),
- wire parity (HTTP scores sum == local stub sum; the mock computes
  the same deterministic function),
- calibration state after the corpus-scale run vs the sequential
  reference loop (`gemini_api.cpp:22-69`) over the same score stream.

Usage: python tools/stress_rerank.py [--src /tmp/sf1]
(candidate pool = documents table unioned with one id-shifted copy)
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, "/root/repo")

QUERY = "how to merge fast table join"


class _ScoreMock(BaseHTTPRequestHandler):
    post_count = 0
    lock = threading.Lock()

    def do_POST(self):
        from ai_vector_database_converstion_from_pdf_spark.operators.rerank import stub_score

        n = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(n))
        with type(self).lock:
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/sf1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ai_vector_database_converstion_from_pdf_spark.operators.rerank import (
        PREFIX_CHARS,
        Calibrator,
        batch_score,
        stub_score,
    )
    from ai_vector_database_converstion_from_pdf_spark.session import get_spark

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _ScoreMock)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    endpoint = f"http://127.0.0.1:{httpd.server_address[1]}"

    spark = get_spark("stress-rerank")
    docs = spark.read.parquet(f"{args.src}/documents.parquet").select(
        "doc_id", "text"
    )
    pool = (
        docs.unionByName(
            docs.select((F.col("doc_id") + 100_000_000).alias("doc_id"), "text")
        )
        .persist()
    )
    total = pool.count()
    print(f"candidate pool: {total} rows from {args.src}")

    results = {}
    for n in (25_000, 50_000, 100_000):
        cand = pool.limit(n).persist()
        cand.count()  # materialize input before the clock starts
        _ScoreMock.post_count = 0
        t0 = time.perf_counter()
        s_http = batch_score(
            cand, QUERY, endpoint=endpoint, model="bge-reranker"
        ).agg(F.sum("rerank_raw")).first()[0]
        dt_http = time.perf_counter() - t0
        posts = _ScoreMock.post_count
        t0 = time.perf_counter()
        s_stub = batch_score(cand, QUERY).agg(F.sum("rerank_raw")).first()[0]
        dt_stub = time.perf_counter() - t0
        parity = abs(s_http - s_stub) < 1e-9
        results[n] = (dt_http, dt_stub, posts, parity)
        print(
            f"STRESS rerank n={n}: http={dt_http:.2f}s stub={dt_stub:.2f}s "
            f"posts={posts} ({n / max(posts, 1):.0f} docs/POST) "
            f"parity={'OK' if parity else f'FAIL {s_http} vs {s_stub}'}"
        )
        cand.unpersist()

    # linearity: 100k should cost <= ~1.5x of 2x the 50k wall
    r50, r100 = results[50_000][0], results[100_000][0]
    print(f"linearity http 100k/50k = {r100 / r50:.2f}x (2.0 = perfectly linear)")

    # calibration parity at 100k: distributed scores, driver-side
    # batch updates vs the sequential reference loop
    rows = (
        batch_score(pool.limit(100_000), QUERY)
        .select("doc_id", "text", "rerank_raw")
        .orderBy("doc_id")
        .collect()
    )
    batch = 1000
    cal_d, cal_s = Calibrator(), Calibrator()
    for i in range(0, len(rows), batch):
        chunk = rows[i : i + batch]
        d = [r["rerank_raw"] for r in chunk]
        s = [stub_score(QUERY, (r["text"] or "")[:PREFIX_CHARS]) for r in chunk]
        for cal, scores in ((cal_d, d), (cal_s, s)):
            if cal.check_consistency(scores):
                cal.update_stats(scores)
            else:
                cal.anomalies.append("frozen-model")
    same = (cal_d.mean, cal_d.std, cal_d.sample_count, cal_d.anomalies) == (
        cal_s.mean, cal_s.std, cal_s.sample_count, cal_s.anomalies
    )
    print(
        f"calibration: mean={cal_d.mean:.6f} std={cal_d.std:.6f} "
        f"batches={cal_d.sample_count} anomalies={cal_d.anomalies} "
        f"sequential-parity={'OK' if same else 'FAIL'}"
    )
    httpd.shutdown()


if __name__ == "__main__":
    main()
