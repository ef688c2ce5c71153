"""Real HTTP provider connectors behind the pluggable model seams.

Reference: `GeminiApi` (`gemini_api.cpp:238-314,570-737`) speaks three
HTTP dialects — Gemini REST, Ollama, LM Studio (OpenAI-shaped) — for
embeddings, rerank scoring, and model discovery. This module implements
the same wire shapes with stdlib urllib only (no SDK dependency), so the
iterator-pandas-UDF seams (`embed.make_embed_udf`, `rerank.batch_score`)
can run against a real server. Tests exercise every path against a local
http.server mock (tests/test_http_providers.py); production points the
endpoint at a real host.

Batching: one POST per Arrow batch — the scale contract. The reference
holds ONE request in flight per chunk; here a 10k-row partition costs
~10 HTTP round trips, not 10k.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from typing import Iterator

# module-scope import: pandas_udf resolves the (stringified) type hints
# against module globals, so `pd` must live here, not inside the factory
import pandas as pd


def _post_json(url: str, payload: dict, timeout: float) -> dict:
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return json.loads(resp.read().decode())
    except urllib.error.HTTPError as e:
        raise RuntimeError(
            f"provider POST {url} failed: HTTP {e.code} {e.read()[:200]!r}"
        ) from e
    except urllib.error.URLError as e:
        raise RuntimeError(f"provider POST {url} unreachable: {e.reason}") from e


def _get_json(url: str, timeout: float) -> dict:
    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            return json.loads(resp.read().decode())
    except urllib.error.URLError as e:
        raise RuntimeError(f"provider GET {url} failed: {e}") from e


class HttpEmbedProvider:
    """Batch embedding over HTTP. styles:
    - "ollama":  POST {endpoint}/api/embed       {"model", "input": [...]}
                 → {"embeddings": [[...], ...]}
    - "openai":  POST {endpoint}/v1/embeddings   {"model", "input": [...]}
                 → {"data": [{"embedding": [...]}, ...]}   (LM Studio)
    """

    def __init__(self, endpoint: str, model: str, style: str = "ollama",
                 timeout: float = 30.0):
        if style not in ("ollama", "openai"):
            raise ValueError(f"unknown embed style {style!r}")
        self.endpoint = endpoint.rstrip("/")
        self.model = model
        self.style = style
        self.timeout = timeout

    def embed_batch(self, texts: list[str]) -> list[list[float]]:
        if not texts:
            return []
        if self.style == "ollama":
            out = _post_json(
                f"{self.endpoint}/api/embed",
                {"model": self.model, "input": texts},
                self.timeout,
            )
            vecs = out["embeddings"]
        else:
            out = _post_json(
                f"{self.endpoint}/v1/embeddings",
                {"model": self.model, "input": texts},
                self.timeout,
            )
            vecs = [d["embedding"] for d in out["data"]]
        if len(vecs) != len(texts):
            raise RuntimeError(
                f"provider returned {len(vecs)} embeddings for {len(texts)} inputs"
            )
        return [[float(x) for x in v] for v in vecs]


class HttpRerankProvider:
    """Cross-encoder rerank scoring (Cohere/Jina/bge-server wire shape):
    POST {endpoint}/v1/rerank {"model", "query", "documents": [...]}
    → {"results": [{"index": i, "relevance_score": s}, ...]}."""

    def __init__(self, endpoint: str, model: str, timeout: float = 30.0):
        self.endpoint = endpoint.rstrip("/")
        self.model = model
        self.timeout = timeout

    def score_batch(self, query: str, docs: list[str]) -> list[float]:
        if not docs:
            return []
        out = _post_json(
            f"{self.endpoint}/v1/rerank",
            {"model": self.model, "query": query, "documents": docs},
            self.timeout,
        )
        scores = [0.0] * len(docs)
        for r in out["results"]:
            scores[int(r["index"])] = float(r["relevance_score"])
        return scores


class HttpOcrProvider:
    """I13 — PDF→text OCR over a multimodal generateContent endpoint
    (Gemini REST wire shape, `gemini_api.cpp:275-314`: the whole PDF is
    base64'd into one inline_data part alongside an instruction part;
    the reply's first candidate part carries the extracted text):

    POST {endpoint}/v1beta/models/{model}:generateContent[?key=...]
      {"contents": [{"parts": [
          {"inline_data": {"mime_type": "application/pdf", "data": b64}},
          {"text": prompt}]}]}
    → {"candidates": [{"content": {"parts": [{"text": "..."}]}}]}
    """

    def __init__(
        self,
        endpoint: str,
        model: str,
        api_key: str = "",
        prompt: str = "Extract all text from this PDF document.",
        timeout: float = 120.0,
    ):
        self.endpoint = endpoint.rstrip("/")
        self.model = model
        self.api_key = api_key
        self.prompt = prompt
        self.timeout = timeout

    def ocr(self, pdf_bytes: bytes) -> str:
        import base64

        url = f"{self.endpoint}/v1beta/models/{self.model}:generateContent"
        if self.api_key:
            url += f"?key={self.api_key}"
        out = _post_json(
            url,
            {
                "contents": [
                    {
                        "parts": [
                            {
                                "inline_data": {
                                    "mime_type": "application/pdf",
                                    "data": base64.b64encode(pdf_bytes).decode(),
                                }
                            },
                            {"text": self.prompt},
                        ]
                    }
                ]
            },
            self.timeout,
        )
        cands = out.get("candidates") or []
        if not cands:
            raise RuntimeError(f"OCR provider returned no candidates: {out!r}")
        parts = cands[0].get("content", {}).get("parts") or []
        return "\n".join(p["text"] for p in parts if "text" in p)


def make_http_embed_udf(provider: HttpEmbedProvider):
    """Iterator pandas UDF embedding one POST per Arrow batch. The
    provider object (endpoint/model strings) pickles into the closure."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, FloatType

    @F.pandas_udf(ArrayType(FloatType()))
    def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            vecs = provider.embed_batch([(t or "") for t in s])
            yield pd.Series(vecs, index=s.index)

    return embed


def ollama_probe(endpoint: str, timeout: float = 5.0):
    """GET /api/tags → [(name, 'ollama', endpoint)] (`gemini_api.cpp:668`)."""
    out = _get_json(f"{endpoint.rstrip('/')}/api/tags", timeout)
    return [(m["name"], "ollama", endpoint) for m in out.get("models", [])]


def lmstudio_probe(endpoint: str, timeout: float = 5.0):
    """GET /v1/models → [(id, 'lmstudio', endpoint)] (`gemini_api.cpp:676`)."""
    out = _get_json(f"{endpoint.rstrip('/')}/v1/models", timeout)
    return [(m["id"], "lmstudio", endpoint) for m in out.get("data", [])]
