"""Text + scoring column expressions shared across operators."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Tokenization rule used by the keyword/FTS analog and the inverted index:
# lowercase, split on non-alphanumeric runs, drop empties. The reference
# delegates tokenization to SQLite FTS5's default unicode61 tokenizer
# (`vector_store.cpp:89`); this is the portable equivalent and is exactly
# reproducible in ANSI SQL for the DuckDB oracle.
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def norm_text(col: Column) -> Column:
    return F.lower(F.trim(col))


def tokens(col: Column) -> Column:
    """array<string> of lowercase alphanumeric tokens, empties removed."""
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT_RE), lambda t: t != "")


SECONDS_30D = 3600.0 * 24.0 * 30.0


def trust_score(boost: Column, created_at: Column, asof: Column) -> Column:
    """trust = boost * max(0.5, 1 - age_secs/30d).

    Reference: `vector_store.cpp:221-225` — computed against wall clock
    there; we take an injected ``asof`` so batch runs are deterministic
    (FIXTURES.md §C). Pure expression → codegen'd, scan-speed at 100 TB.
    """
    age = asof.cast("double") - created_at.cast("double")
    recency = F.greatest(F.lit(0.5), F.lit(1.0) - age / F.lit(SECONDS_30D))
    return boost * recency
