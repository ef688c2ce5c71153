"""Q4/Q5 — intent classification + routing parameters.

Reference: `VectorStore::detectIntent` (`vector_store.cpp:239-246`) — four
word-boundary regexes over the lowercased query, first hit wins; routing
weights/depth at `vector_store.cpp:303-319`.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, functions as F

# (intent, pattern) in priority order — same patterns/precedence as the
# reference; `\b` works identically in Java regex (Spark rlike) and in the
# DuckDB oracle's regexp_matches.
INTENT_RULES: tuple[tuple[str, str], ...] = (
    ("definition", r"\b(what is|define|definition of|meaning of|theorem|lemma)\b"),
    ("procedure", r"\b(how to|steps to|procedure for|process of)\b"),
    ("summary", r"\b(summary|overview|explain chapter|summarize)\b"),
    ("example", r"\b(example|illustration|case study|walkthrough)\b"),
)


def detect_intent_col(query_col: Column) -> Column:
    """Intent label expression (cascade of rlike over lowercase text)."""
    q = F.lower(query_col)
    expr = F.lit("general")
    for name, pat in reversed(INTENT_RULES):
        expr = F.when(q.rlike(pat), F.lit(name)).otherwise(expr)
    return expr


def detect_intent(query_text: str) -> str:
    import re

    q = query_text.lower()
    for name, pat in INTENT_RULES:
        if re.search(pat, q):
            return name
    return "general"


@dataclass(frozen=True)
class Routing:
    """Fusion weights + retrieval depth (`vector_store.cpp:303-319`)."""

    w_semantic: float
    w_keyword: float
    depth_mult: int
    stability_mult: float  # `vector_store.cpp:444-448`


ROUTING: dict[str, Routing] = {
    "definition": Routing(0.35, 0.65, 3, 2.0),
    "procedure": Routing(0.35, 0.65, 3, 1.5),
    "summary": Routing(0.7, 0.3, 6, 1.0),
    "example": Routing(0.5, 0.5, 4, 0.5),
    "general": Routing(0.5, 0.5, 4, 0.5),
}


def route(intent: str) -> Routing:
    return ROUTING.get(intent, ROUTING["general"])
