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

from pyspark.sql import DataFrame, Window, functions as F

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


def temperature_mixture_sample(
    docs: DataFrame,
    alpha: float,
    total_target: int,
    strat_col: str,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Temperature-scaled multinomial source mixing — the exponentiated
    reweighting multilingual LM corpora use (XLM-R/mT5 style: sample
    source s with probability n_s^α / Σ n_t^α, α<1 upweights rare
    sources relative to their natural share). Per-source target =
    round(total_target · w_s, 6) floored; membership decided by the
    salted content-stable hash bucket, so the draw is deterministic and
    re-runnable.

    Determinism across engines: n^α is one correctly-rounded pow of an
    exact integer in BOTH engines; the share is rounded to 6 decimals
    BEFORE the floor, so a 1-ulp pow/division difference cannot flip a
    bucket threshold.

    Scale: one strata-sized count agg; Σ n^α folded into the same tiny
    frame (a strata-count window, never the corpus); thresholds
    broadcast back over one narrow corpus scan."""
    counts = docs.groupBy(strat_col).agg(F.count(F.lit(1)).alias("cs"))
    w = Window.partitionBy()  # strata-sized frame only — never the corpus
    weighted = counts.withColumn(
        "pw", F.pow(F.col("cs").cast("double"), F.lit(float(alpha)))
    ).withColumn("tot", F.sum("pw").over(w))
    thresh = F.least(
        F.lit(SAMPLE_MOD).cast("long"),
        F.floor(
            F.round(
                F.lit(float(total_target)) * F.col("pw") / F.col("tot"), 6
            )
            / F.col("cs")
            * SAMPLE_MOD
        ),
    )
    key = F.concat(F.lit(salt), F.col(id_col).cast("string"))
    return (
        docs.join(F.broadcast(weighted.withColumn("thr", thresh)), strat_col)
        .filter(hash_bucket(key) < F.col("thr"))
        .drop("cs", "pw", "tot", "thr")
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


def _token_buckets(
    df: DataFrame, n_buckets: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, bucket) one row per token occurrence — the md5-prefix hashed
    feature stream shared by the DSIR lambda build and scoring."""
    from ..functions.text import tokens

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    return toks.select(
        "id",
        (
            F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
            % n_buckets
        ).alias("bucket"),
    )


def dsir_score_expr(
    text_col, lam_micro: dict[int, int], n_buckets: int = 512
):
    """Map-side DSIR scoring as a PURE EXPRESSION over a frozen lambda
    table: (n_tokens, weight) struct per row — sum over the row's
    tokens of lam_micro[bucket(token)], identical integer arithmetic to
    the shuffle-based batch scorer. The <= n_buckets lambda entries
    ship as a map literal in the plan, so this is a stateless
    projection: usable in STRUCTURED STREAMING (no aggregation state,
    no watermark needed) and on any batch frame without a shuffle."""
    from ..functions.text import tokens

    pairs = []
    for b, m in sorted(lam_micro.items()):
        pairs.append(F.lit(int(b)))
        pairs.append(F.lit(int(m)))
    ts = tokens(text_col)
    if pairs:
        lam_map = F.create_map(*pairs)
        bucket_of = lambda t: (
            F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long") % n_buckets
        )
        total = F.aggregate(
            ts,
            F.lit(0).cast("long"),
            lambda acc, t: acc
            + F.coalesce(lam_map[bucket_of(t)], F.lit(0).cast("long")),
        )
    else:
        # empty model: create_map() has VOID keys and can't be indexed
        total = F.lit(0).cast("long")
    return F.struct(
        F.size(ts).cast("long").alias("n_tokens"),
        F.round(total.cast("double") / F.lit(1e6), 6).alias("weight"),
    )


def dsir_lambda(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The frozen DSIR model: (bucket, lam_micro) log-likelihood-ratio
    table (add-one smoothed, rounded to 6, integer micro-units).
    Collect it once and feed `dsir_score_expr` to score ANY frame —
    including a structured stream — map-side."""
    raw_b = _token_buckets(docs, n_buckets, id_col, text_col)
    tgt_b = _token_buckets(target, n_buckets, id_col, text_col)
    raw_counts = raw_b.groupBy("bucket").agg(F.count("*").alias("cr"))
    tgt_counts = tgt_b.groupBy("bucket").agg(F.count("*").alias("ct"))
    raw_total = raw_b.agg(F.count("*").alias("tr"))
    tgt_total = tgt_b.agg(F.count("*").alias("tt"))
    # FULL bucket spine: buckets unseen in the raw corpus still carry
    # their add-one-smoothed log-ratio (ln((tt+B)...(tr+B)) algebra with
    # cr=ct=0), so a frozen model scores NEW vocabulary correctly
    # instead of substituting 0
    spine = docs.sparkSession.range(n_buckets).select(
        F.col("id").alias("bucket")
    )
    return (
        spine.join(raw_counts, "bucket", "left")
        .join(tgt_counts, "bucket", "left")
        .crossJoin(F.broadcast(raw_total))
        .crossJoin(F.broadcast(tgt_total))
        .select(
            "bucket",
            F.round(
                F.round(
                    F.log(
                        (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0))
                        / (F.col("tt") + F.lit(float(n_buckets)))
                    )
                    - F.log(
                        (F.coalesce(F.col("cr"), F.lit(0)) + F.lit(1.0))
                        / (F.col("tr") + F.lit(float(n_buckets)))
                    ),
                    6,
                )
                * F.lit(1e6)
            )
            .cast("long")
            .alias("lam_micro"),
        )
    )


def dsir_importance_weights(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by how much more likely its hashed-unigram bag is under the
    TARGET distribution than under the RAW distribution,

        weight(d) = sum_tokens ln p_target(bucket(tok)) / p_raw(bucket(tok))

    with add-one smoothing over ``n_buckets`` hashed features. High
    weight = looks like the target domain; feed the output to
    priority/top-k selection to re-balance a 100 TB crawl toward a
    curated target (the published pipeline's exact shape).

    Cross-engine determinism: buckets use the md5-prefix hash (portable
    to the DuckDB oracle); per-bucket log-ratios are rounded to 6 and
    scaled to integer micro-units BEFORE the per-doc sum, so the
    accumulation is exact integer arithmetic (the decayed-engagement
    idiom).

    Scale shape: one token-explode scan per corpus for the two
    bucket-count tables (each ``n_buckets`` rows — broadcast), then one
    (doc, bucket) aggregate joined broadcast against the lambda table
    and summed per doc. The raw corpus shuffles once, keyed by doc.
    Returns (doc_id, n_tokens, weight) — every doc, unweighted rows
    intact for downstream sampling.
    """
    raw_b = _token_buckets(docs, n_buckets, id_col, text_col)
    lam = dsir_lambda(docs, target, n_buckets, id_col, text_col)
    doc_buckets = raw_b.groupBy("id", "bucket").agg(F.count("*").alias("c"))
    return (
        doc_buckets.join(F.broadcast(lam), "bucket")
        .groupBy("id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.round(
                F.sum(F.col("c") * F.col("lam_micro")).cast("double") / F.lit(1e6), 6
            ).alias("weight"),
        )
        .withColumnRenamed("id", id_col)
    )
