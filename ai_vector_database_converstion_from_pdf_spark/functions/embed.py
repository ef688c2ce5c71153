"""I16 — pluggable embedding provider interface + deterministic stub.

Reference: `GeminiApi::getEmbeddings` (`gemini_api.cpp:238-273,570-623`) —
per-chunk HTTP embed calls to Gemini/Ollama/LM Studio, provider chosen by
config. In Spark the provider is a batched iterator pandas UDF (one HTTP
batch per Arrow batch, 10-100x fewer round trips than the reference's
one-in-flight loop); tests and offline runs use the deterministic local
hash embedder below (FIXTURES.md §C), which implements the same interface.
"""

from __future__ import annotations

import hashlib
import math
import re
from typing import Iterator

import numpy as np
import pandas as pd


def hash_embed(text: str, dim: int = 64) -> list[float]:
    """Deterministic bag-of-hashed-tokens embedding, L2-normalized.
    Stable across processes (md5, not Python hash())."""
    vec = np.zeros(dim, dtype=np.float64)
    for tok in re.split(r"[^a-z0-9]+", text.lower()):
        if not tok:
            continue
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        vec[h % dim] += 1.0 if (h >> 8) % 2 == 0 else -1.0
    n = float(np.linalg.norm(vec))
    if n > 0:
        vec /= n
    return [float(x) for x in vec]


def make_embed_udf(dim: int = 64):
    """Iterator-of-series pandas UDF: the batching shape a real HTTP
    provider plugs into (swap the inner loop for a batched POST)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, FloatType

    @F.pandas_udf(ArrayType(FloatType()))
    def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(lambda t: hash_embed(t or "", dim))

    return embed


def check_dimension(existing_dim: int | None, new_dim: int) -> None:
    """I17 dimension guardrail (`vector_store.cpp:186-189,780-787`,
    `mainwindow.cpp:529-540`): first write registers the dim; later
    writes with a different dim are rejected."""
    if existing_dim is not None and existing_dim != new_dim:
        raise ValueError(
            f"embedding dimension mismatch: workspace registered {existing_dim}, "
            f"got {new_dim} (reference rejects these inserts)"
        )
