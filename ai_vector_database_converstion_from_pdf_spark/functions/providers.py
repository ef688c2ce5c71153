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


def _post_json(
    url: str, payload: dict, timeout: float, api_key: str = ""
) -> dict:
    headers = {"Content-Type": "application/json"}
    if api_key:
        # header transport, never ?key= in the query string: urllib error
        # text and any URL logging would leak the key (ADVICE r7); Gemini
        # accepts x-goog-api-key equivalently
        headers["x-goog-api-key"] = api_key
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers=headers,
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


def _get_json(url: str, timeout: float, api_key: str = "") -> dict:
    req = urllib.request.Request(url)
    if api_key:
        req.add_header("x-goog-api-key", api_key)
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return json.loads(resp.read().decode())
    except urllib.error.URLError as e:
        raise RuntimeError(f"provider GET {url} failed: {e}") from e


class HttpEmbedProvider:
    """Batch embedding over HTTP. styles:
    - "ollama":  POST {endpoint}/api/embed       {"model", "input": [...]}
                 → {"embeddings": [[...], ...]}
    - "openai":  POST {endpoint}/v1/embeddings   {"model", "input": [...]}
                 → {"data": [{"embedding": [...]}, ...]}   (LM Studio)
    - "gemini":  POST {endpoint}/v1beta/models/{model}:batchEmbedContents
                 (key via x-goog-api-key header)  {"requests": [{"model": "models/{model}",
                 "content": {"parts": [{"text": t}]},
                 "task_type": "RETRIEVAL_DOCUMENT"}, ...]}
                 → {"embeddings": [{"values": [...]}, ...]}
                 The reference's default dialect (`gemini_api.cpp:256-263`
                 request shape, `570-623` response parse — we accept both
                 the single-`embedding` object and the `embeddings` array
                 it handles); batched through the public
                 batchEmbedContents endpoint so one POST still covers one
                 Arrow batch.
    """

    def __init__(self, endpoint: str, model: str, style: str = "ollama",
                 timeout: float = 30.0, api_key: str = "",
                 task_type: str = "RETRIEVAL_DOCUMENT"):
        if style not in ("ollama", "openai", "gemini"):
            raise ValueError(f"unknown embed style {style!r}")
        self.endpoint = endpoint.rstrip("/")
        self.model = model
        self.style = style
        self.timeout = timeout
        self.api_key = api_key
        self.task_type = task_type

    def _embed_gemini(self, texts: list[str]) -> list[list[float]]:
        url = f"{self.endpoint}/v1beta/models/{self.model}:batchEmbedContents"
        out = _post_json(
            url,
            {
                "requests": [
                    {
                        "model": f"models/{self.model}",
                        "content": {"parts": [{"text": t}]},
                        "task_type": self.task_type,
                    }
                    for t in texts
                ]
            },
            self.timeout,
            api_key=self.api_key,
        )
        # Response parse mirrors onEmbeddingsReply (`gemini_api.cpp:604-612`):
        # prefer the batch "embeddings" array of {"values": [...]}, accept a
        # single {"embedding": {"values": [...]}} for 1-text requests.
        if "embeddings" in out:
            return [e["values"] for e in out["embeddings"]]
        if "embedding" in out and len(texts) == 1:
            return [out["embedding"]["values"]]
        raise RuntimeError(f"gemini embed response missing values: {out!r}")

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
        elif self.style == "gemini":
            vecs = self._embed_gemini(texts)
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


# The reference's summary instruction, verbatim prompt parity
# (`gemini_api.cpp:330`): a migration keeps byte-identical model inputs.
SUMMARY_PROMPT = (
    "Summarize the following textbook section into a single concise "
    "paragraph (max 3 sentences). Focus on core concepts and terminology. "
    "\n\n Content: {text}"
)

SYNTHESIS_SYSTEM = (
    "You are a helpful and intelligent synthesis assistant. Please format "
    "all responses in valid JSON."
)


class HttpChatProvider:
    """Text generation over HTTP — the reference's reason-engine triple
    dialect (`gemini_api.cpp:316-377` summary, `420-476` synthesis):

    - "gemini":  POST {endpoint}/v1beta/models/{model}:generateContent
                 (key via x-goog-api-key header)  {"contents": [{"parts": [{"text": prompt}]}]}
                 → candidates[0].content.parts[0].text
    - "ollama":  POST {endpoint}/api/generate
                 {"model", "prompt", "stream": false,
                  "options": {"temperature": t}?}
                 → {"response": "..."}
    - "openai":  POST {endpoint}/v1/chat/completions (LM Studio)
                 {"model", "messages": [...], "temperature": t?}
                 → choices[0].message.content
    """

    def __init__(self, endpoint: str, model: str, style: str = "gemini",
                 timeout: float = 120.0, api_key: str = ""):
        if style not in ("gemini", "ollama", "openai"):
            raise ValueError(f"unknown chat style {style!r}")
        self.endpoint = endpoint.rstrip("/")
        self.model = model
        self.style = style
        self.timeout = timeout
        self.api_key = api_key

    def generate(self, prompt: str, system: str = "",
                 temperature: float | None = None) -> str:
        if self.style == "gemini":
            url = f"{self.endpoint}/v1beta/models/{self.model}:generateContent"
            out = _post_json(
                url,
                {"contents": [{"parts": [{"text": prompt}]}]},
                self.timeout,
                api_key=self.api_key,
            )
            cands = out.get("candidates") or []
            if not cands:
                raise RuntimeError(f"chat provider returned no candidates: {out!r}")
            parts = cands[0].get("content", {}).get("parts") or []
            return "\n".join(p["text"] for p in parts if "text" in p).strip()
        if self.style == "ollama":
            payload: dict = {"model": self.model, "prompt": prompt, "stream": False}
            if temperature is not None:
                payload["options"] = {"temperature": temperature}
            out = _post_json(f"{self.endpoint}/api/generate", payload, self.timeout)
            return str(out.get("response", "")).strip()
        # openai / LM Studio chat completions
        messages = []
        if system:
            messages.append({"role": "system", "content": system})
        messages.append({"role": "user", "content": prompt})
        payload = {"model": self.model, "messages": messages}
        if temperature is not None:
            payload["temperature"] = temperature
        out = _post_json(
            f"{self.endpoint}/v1/chat/completions", payload, self.timeout
        )
        choices = out.get("choices") or []
        if not choices:
            raise RuntimeError(f"chat provider returned no choices: {out!r}")
        return str(choices[0].get("message", {}).get("content", "")).strip()

    def summarize(self, text: str) -> str:
        """I15 summary call (`gemini_api.cpp:316-331`)."""
        return self.generate(SUMMARY_PROMPT.format(text=text))

    def synthesize_report(self, prompt: str) -> str:
        """Y2 synthesis call (`gemini_api.cpp:448-476`): temperature 0,
        JSON-format system message on the chat dialect."""
        return self.generate(prompt, system=SYNTHESIS_SYSTEM, temperature=0.0)


def make_http_summary_udf(provider: "HttpChatProvider"):
    """I15 batch summaries as an iterator pandas UDF — one generate() per
    row (the wire shape is single-prompt), but connection setup amortizes
    per Arrow batch and rows stream executor-side, never on the driver."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def summarize(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield pd.Series(
                [provider.summarize(t or "") for t in s], index=s.index
            )

    return summarize


class HttpOcrProvider:
    """I13 — PDF→text OCR over a multimodal generateContent endpoint
    (Gemini REST wire shape, `gemini_api.cpp:275-314`: the whole PDF is
    base64'd into one inline_data part alongside an instruction part;
    the reply's first candidate part carries the extracted text):

    POST {endpoint}/v1beta/models/{model}:generateContent (key via x-goog-api-key header)
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
            api_key=self.api_key,
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


def gemini_probe(endpoint: str, api_key: str = "", timeout: float = 5.0,
                 method: str = ""):
    """GET /v1beta/models (key via x-goog-api-key header) → [(name, 'gemini', endpoint)]
    (`list_models.py:6-18`, `gemini_api.cpp:664-737` Gemini arm). Model
    names arrive as "models/<id>"; the prefix is stripped so registry
    names match the other engines'. Pass method="embedContent" (or
    "generateContent") to keep only models whose
    supportedGenerationMethods include it, the list_models.py filter."""
    url = f"{endpoint.rstrip('/')}/v1beta/models"
    out = _get_json(url, timeout, api_key=api_key)
    found = []
    for m in out.get("models", []):
        if method and method not in m.get("supportedGenerationMethods", []):
            continue
        name = m.get("name", "")
        if name.startswith("models/"):
            name = name[len("models/"):]
        if name:
            found.append((name, "gemini", endpoint))
    return found
