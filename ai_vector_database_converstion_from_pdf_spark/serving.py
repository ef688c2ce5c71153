"""Q6/Q14/Q17 — serving-layer concerns (SURVEY §2.4).

These are per-session adaptive mechanisms, not batch dataflow: they are
implemented as small driver-side components so the operator checklist is
complete, and they are deliberately OUTSIDE the correctness path (batch
recompute is deterministic; the latency ladder would make results depend
on machine speed — the reference itself only engages it under load).

- Q6 `LatencyGovernor`: EMA latency (seed 100ms, α=0.2) driving the
  degradation ladder — >1500ms avg shrinks retrieval depth to 3x,
  >4000ms bypasses the vector branch (FTS-only) for non-Summary intents
  (`vector_store.cpp:321-337,387-388`).
- Q14 `QueryCache`: L1 exact (canonicalized query, LRU-100) + L2
  semantic (cosine ≥ 0.95 against cached query embeddings)
  (`vector_store.cpp:26,281-301,559-564`).
- Q17 `warmup`: page-cache prime → Spark-native df.cache().count()
  (`vector_store.cpp:610-634`).
"""

from __future__ import annotations

import math
from collections import OrderedDict
from dataclasses import dataclass, field


@dataclass
class LatencyGovernor:
    avg_ms: float = 100.0        # seed, vector_store.cpp:322
    alpha: float = 0.2           # EMA update, :388
    high_ms: float = 1500.0      # depth shrink, :323
    critical_ms: float = 4000.0  # vector bypass, :324

    def observe(self, elapsed_ms: float) -> None:
        self.avg_ms = (1 - self.alpha) * self.avg_ms + self.alpha * elapsed_ms

    def plan(
        self,
        limit: int,
        depth_mult: int,
        intent: str,
        corpus_chunks: int | None = None,
    ) -> dict:
        """Returns the effective retrieval plan: depth + branch gating.

        `corpus_chunks`: total chunk count when cheaply known (the doc
        rollup's folded n_chunks — a rollup-sized aggregate, never a
        corpus scan). Depth is clamped to it: fetching candidates past
        the corpus size buys nothing but a deeper TakeOrdered heap and
        a wider fusion join on every branch."""
        if self.avg_ms > self.critical_ms and intent != "summary":
            d = limit
        elif self.avg_ms > self.high_ms:
            d = limit * 3
        else:
            d = limit * depth_mult
        mode = (
            "critical"
            if (self.avg_ms > self.critical_ms and intent != "summary")
            else ("degraded" if self.avg_ms > self.high_ms else "normal")
        )
        if corpus_chunks is not None:
            d = min(d, max(int(corpus_chunks), limit))
        return {"depth": d, "vector_branch": mode != "critical", "mode": mode}


def _cosine(a: list[float], b: list[float]) -> float:
    if not a or not b or len(a) != len(b):
        return 0.0
    dot = n1 = n2 = 0.0
    for x, y in zip(a, b):
        dot += x * y
        n1 += x * x
        n2 += y * y
    return dot / (math.sqrt(n1) * math.sqrt(n2)) if n1 > 0 and n2 > 0 else 0.0


@dataclass
class QueryCache:
    """Two-layer result cache. Values are whatever the caller stores
    (collected result rows)."""

    capacity: int = 100               # vector_store.cpp:26
    semantic_threshold: float = 0.95  # vector_store.h:86
    _exact: OrderedDict = field(default_factory=OrderedDict)
    _semantic: list = field(default_factory=list)  # (embedding, value)
    hits: int = 0
    misses: int = 0

    @staticmethod
    def canonical(query: str) -> str:
        return query.strip().lower()  # vector_store.cpp:281

    def get(self, query: str, embedding: list[float] | None = None, variant: str = ""):
        """`variant` disambiguates result-shaping options (k, rerank/mmr/
        exploration flags): a hit for one option set must not be served
        for another — the reference keys only on query text but also
        returns the same shape every time; here shapes differ."""
        key = (self.canonical(query), variant)
        if key in self._exact:
            self._exact.move_to_end(key)
            self.hits += 1
            return self._exact[key]
        if embedding is not None:
            for emb, var, value in self._semantic:
                if var == variant and _cosine(embedding, emb) > self.semantic_threshold:
                    self.hits += 1
                    return value
        self.misses += 1
        return None

    def put(
        self,
        query: str,
        value,
        embedding: list[float] | None = None,
        variant: str = "",
    ) -> None:
        key = (self.canonical(query), variant)
        self._exact[key] = value
        self._exact.move_to_end(key)
        while len(self._exact) > self.capacity:
            self._exact.popitem(last=False)
        if embedding is not None:
            self._semantic.append((embedding, variant, value))
            del self._semantic[: max(0, len(self._semantic) - self.capacity)]

    def clear(self) -> None:
        """Invalidate everything — called on workspace mutations (index,
        boost): cached rows embed text/scores that a mutation can change."""
        self._exact.clear()
        self._semantic.clear()


def warmup(df) -> int:
    """Q17: prime executor caches; returns row count like the reference's
    background SELECT COUNT(id)."""
    return df.cache().count()
