"""Deterministic sampling for training-data pipelines.

A 100 TB corpus is rarely trained on whole: pipelines draw per-stratum
(language, source, quality band) samples at configured rates. Spark's
`df.sample()` is seed-dependent per partitioning and not reproducible
across engines, so these samplers hash CONTENT-STABLE keys: a doc is in
or out independent of partition layout, cluster size, or engine — the
same md5-prefix recipe the MinHash family uses (portable to the DuckDB
oracle byte-for-byte).

Scale: pure narrow expressions — no shuffle, no sort; the filter pushes
into the scan's row-group evaluation like any other predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SAMPLE_MOD = 10_000  # rate granularity: 0.01% steps


def hash_bucket(key_col, mod: int = SAMPLE_MOD) -> F.Column:
    """Uniform bucket in [0, mod): int(md5(key)[0:15] hex) % mod."""
    return (
        F.conv(F.substring(F.md5(key_col.cast("string")), 1, 15), 16, 10)
        .cast("long")
        % mod
    )


def deterministic_sample(
    docs: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep ~rate of rows, decided by content-stable hash of (salt+id).
    `salt` draws an independent sample without touching the data."""
    key = F.concat(F.lit(salt), F.col(id_col).cast("string"))
    return docs.filter(hash_bucket(key) < int(rate * SAMPLE_MOD))


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    strat_col: str,
    default_rate: float = 0.0,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Per-stratum rates (e.g. {'en': 0.5, 'fr': 0.1}); strata not in
    `rates` fall back to default_rate. One narrow pass."""
    key = F.concat(F.lit(salt), F.col(id_col).cast("string"))
    bucket = hash_bucket(key)
    thresh = F.lit(int(default_rate * SAMPLE_MOD))
    for stratum, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(strat_col) == stratum, F.lit(int(rate * SAMPLE_MOD))
        ).otherwise(thresh)
    return docs.filter(bucket < thresh)
