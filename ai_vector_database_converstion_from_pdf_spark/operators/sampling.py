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


def priority_sample(
    docs: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement of n rows: priority
    sampling (Duffield-Lund-Thorup, JACM'07). Each row gets priority
    w / u with u uniform in (0,1]; the n largest priorities form the
    sample, with inclusion probability proportional to weight.

    u is derived from the same content-stable md5 bucket the other
    samplers use — u = (bucket+1)/MOD — so the sample is reproducible
    across engines and partitionings. Crucially the priority is a
    SINGLE IEEE division of two exact integers (w and bucket+1; the
    constant MOD cancels in ranking), which is correctly rounded and
    therefore bit-identical in Spark and the DuckDB oracle — no
    transcendental (ln/pow) cross-engine drift.

    Scale: narrow expressions + TakeOrdered(n) — no corpus shuffle, no
    sort; the per-partition top-n reduces to one driver merge.
    """
    key = F.concat(F.lit(salt), F.col(id_col).cast("string"))
    u_int = hash_bucket(key) + 1  # in [1, MOD]
    priority = F.col(weight_col).cast("double") / u_int.cast("double")
    return (
        docs.withColumn("priority", F.round(priority, 6))
        .orderBy(F.desc("priority"), F.asc(id_col))
        .limit(n)
    )


def mixture_sample(
    docs: DataFrame,
    per_stratum_target: int,
    strat_col: str,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Rebalance toward a uniform stratum mixture: thin each stratum to
    ~`per_stratum_target` rows with a deterministic Bernoulli rate
    min(1, target/count_s). The domain-reweighting step of an LLM data
    pipeline (downsample over-represented sources; keep rare ones whole).

    Determinism across engines: the rate is ONE IEEE division of exact
    values (target/count), then multiply by the bucket modulus and
    floor — every step correctly rounded, so Spark and the SQL oracle
    agree bit-for-bit (no summed-float mixture shares on the hot path).

    Scale: counts are a strata-sized aggregate broadcast back; the
    corpus itself is scanned once with a narrow filter.
    """
    counts = docs.groupBy(strat_col).agg(F.count(F.lit(1)).alias("cs"))
    key = F.concat(F.lit(salt), F.col(id_col).cast("string"))
    thresh = F.least(
        F.lit(SAMPLE_MOD).cast("long"),
        F.floor(
            (F.lit(float(per_stratum_target)) / F.col("cs")) * SAMPLE_MOD
        ),
    )
    return (
        docs.join(F.broadcast(counts), strat_col)
        .filter(hash_bucket(key) < thresh)
        .drop("cs")
    )


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
