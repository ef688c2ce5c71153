"""Distributed linear (logistic) quality probe over hashed text features.

The fasttext-style quality classifier every LLM-data pipeline trains
("does this doc look like the curated domain?") expressed relationally:
batch gradient descent on hashed unigram-count features, a fixed number
of synchronous full-batch iterations. No MLlib dependency — each
iteration is ONE broadcast join of the (n_buckets)-sized weight table
onto the feature table plus two aggregates, so the same code shape runs
on 100 TB (the corpus is scanned once into features; everything
model-sized is broadcast).

Cross-engine determinism (the PageRank contract, applied to GD): weights
and probabilities are rounded to 6 decimals and carried as integer
micro-units after every step, so per-doc dot products and per-feature
gradients are EXACT integer sums — float accumulation order cannot
drift, and the DuckDB oracle replays the identical unrolled iterations.

Reference analog: the reference app has no trainable scorer; this
extends its static quality heuristics (trust/boost weighting,
vector_store.cpp:221-225) with the standard learned-filter pipeline
stage (GPT-3/LLaMA web-filter style).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.vector import long_array_lit

N_BUCKETS = 64
LR = 50.0  # full-batch rate over L1-normalized features, shared literal


def _features(
    docs: DataFrame, label_col, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """(id, y, bucket, x_micro): L1-normalized hashed unigram counts in
    integer micro-units + binary label. Normalizing by doc length keeps
    per-doc feature vectors on the simplex, so one learning rate fits
    every doc length (raw counts saturate the sigmoid and oscillate)."""
    from ..functions.text import tokens

    base = docs.select(
        F.col(id_col).alias("id"),
        label_col.cast("long").alias("y"),
        tokens(F.col(text_col)).alias("ts"),
    ).filter(F.size("ts") > 0)
    toks = base.select(
        "id", "y", F.size("ts").cast("long").alias("len"),
        F.explode("ts").alias("tok"),
    )
    return (
        toks.select(
            "id",
            "y",
            "len",
            (
                F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
                % n_buckets
            ).alias("bucket"),
        )
        .groupBy("id", "y", "len", "bucket")
        .agg(F.count("*").alias("c"))
        .select(
            "id",
            "y",
            "bucket",
            F.round(
                F.round(F.col("c") / F.col("len"), 6) * F.lit(1e6)
            ).cast("long").alias("x_micro"),
        )
    )


def logistic_probe(
    docs: DataFrame,
    label_col,
    n_iters: int = 2,
    n_buckets: int = N_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train `n_iters` full-batch GD steps of L2-free logistic
    regression from w = 0, return per-doc scores (id, y, score).

    Step math (identical expression order in both engines; x in
    micro-units, w in micro-units, so dots/gradients scale by 1e12):
      p_micro(d)   = round(sigmoid(dot_micro(d)/1e12), 6) * 1e6   [int]
      grad_micro(j)= sum_d (p_micro(d) - y_d*1e6) * x_micro(d,j)   [exact]
      w_micro(j)  -= round(round(LR * (grad/1e12) / n, 6) * 1e6)   [int]
    At w = 0 the first step's p is exactly 0.5 — no exp() involved, so
    iteration 1 is pure integer arithmetic end-to-end. At LR=50 the
    separation AND the logistic loss improve monotonically across
    iterations on the fixture (larger rates oscillate, smaller crawl).
    """
    if int(n_iters) < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    feat = _features(docs, label_col, id_col, text_col, n_buckets).persist()
    try:
        # resid seed straight from docs (ids are unique per contract) —
        # skips _train's .distinct() exchange over the feature table;
        # empty-token docs add resid rows that inner-join to nothing
        resid0 = docs.select(
            F.col(id_col).alias("id"), label_col.cast("long").alias("y")
        )
        _w, scored = _train(feat, docs.count(), int(n_iters), resid0=resid0)
        return scored.select("id", "y", "score")
    finally:
        feat.unpersist()


def _train(feat: DataFrame, n_docs: int, n_iters: int, resid0=None):
    """The shared GD core: returns ({bucket: w_micro} dict — the model
    is n_buckets-sized by construction, so it lives on the driver and
    ships back as a plan-literal map, the ivf_assign centroid idiom —
    and the final lazy scored frame (id, y, score, r_micro)).

    Join strategy (guide §3.1, deliberate): the per-iteration gradient
    joins the residual table (one row per doc: id, r_micro) back onto
    the feature table by id. Features are grouped by (id,y,len,bucket),
    NOT id, so this was a full two-sided shuffle per iteration; the
    residual side is two longs per doc, so it is broadcast whenever the
    doc count fits (`SPARK_GRAFT_PROBE_BCAST_MAX_DOCS`, default 20M ≈
    320 MB framed — the guide's 'few hundred MB is fine' bound), which
    removes both per-iteration exchanges. Above the bound the plain
    shuffle join returns. The weight table never shuffles at all: step
    rounding stays IN Spark (identical float semantics), the <= 64-row
    stepped gradient is collected, and the integer update runs in the
    driver — exact long arithmetic in either place, so results are
    bit-identical."""
    import os as _os

    # residual table starts closed-form: p = 0.5 everywhere at w = 0.
    # resid0 (id, y) is map-side when the caller knows ids are unique
    # (documents are); the .distinct() fallback keeps operator parity
    # for arbitrary feat frames.
    if resid0 is None:
        resid0 = feat.select("id", "y").distinct()
    resid = resid0.select(
        "id", (F.lit(500_000) - F.col("y") * F.lit(1_000_000)).alias("r_micro")
    )
    bcast_max = int(
        _os.environ.get("SPARK_GRAFT_PROBE_BCAST_MAX_DOCS", "20000000")
    )
    maybe_b = F.broadcast if n_docs <= bcast_max else (lambda df: df)
    w_map: dict[int, int] = {}
    scored = None
    for _ in range(n_iters):
        grad = (
            feat.join(maybe_b(resid), "id")
            .groupBy("bucket")
            .agg(F.sum(F.col("r_micro") * F.col("x_micro")).alias("g_micro"))
        )
        step = F.round(
            F.round(
                F.lit(LR)
                * (F.col("g_micro").cast("double") / F.lit(1e12))
                / F.lit(float(n_docs)),
                6,
            )
            * F.lit(1e6)
        ).cast("long")
        # model-sized collect replaces the former 64-row localCheckpoint
        # + broadcast-join round trip
        for r in grad.select("bucket", step.alias("s")).collect():
            w_map[int(r.bucket)] = w_map.get(int(r.bucket), 0) - int(r.s)

        # weights as ONE dense array literal indexed by bucket (a single
        # py4j lit, the query_vector_lit idiom — per-entry create_map
        # lits cost a py4j round-trip each at plan-build time); buckets
        # absent from grad keep weight 0, identical to the old
        # inner-join drop semantics (a dropped row contributes 0 to the
        # per-doc sum; no doc can lose ALL rows since grad covers every
        # bucket present in feat)
        dense = [0] * ((max(w_map) + 1) if w_map else 1)
        for b, m in w_map.items():
            dense[int(b)] = int(m)
        # long_array_lit: F.lit(list) costs one py4j round-trip per
        # element — per GD iteration here (r14, the query_vector_lit fix)
        wa = long_array_lit(dense)
        dots = (
            feat.select(
                "id",
                "y",
                (
                    F.element_at(wa, F.col("bucket").cast("int") + F.lit(1))
                    * F.col("x_micro")
                ).alias("t"),
            )
            .groupBy("id", "y")
            .agg(F.sum("t").alias("dot_micro"))
        )
        p = F.round(
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-(F.col("dot_micro").cast("double") / F.lit(1e12)))),
            6,
        )
        scored = dots.select(
            "id",
            "y",
            p.alias("score"),
            (F.round(p * F.lit(1e6)).cast("long") - F.col("y") * F.lit(1_000_000)).alias(
                "r_micro"
            ),
        )
        resid = scored.select("id", "r_micro")
    return w_map, scored


def collect_weights(
    docs: DataFrame,
    label_col,
    n_iters: int = 2,
    n_buckets: int = N_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict[int, int]:
    """Train logistic_probe's model and return the FINAL weight table
    as {bucket: w_micro} for probe_score_expr — the frozen-model
    export. Shares _train with logistic_probe (one definition of the
    step math)."""
    if int(n_iters) < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    feat = _features(docs, label_col, id_col, text_col, n_buckets).persist()
    try:
        resid0 = docs.select(
            F.col(id_col).alias("id"), label_col.cast("long").alias("y")
        )
        w_map, _scored = _train(feat, docs.count(), int(n_iters), resid0=resid0)
        return {int(b): int(m) for b, m in w_map.items()}
    finally:
        feat.unpersist()


def probe_score_expr(text_col, w_micro: dict[int, int], n_buckets: int = N_BUCKETS):
    """Map-side scoring against a FROZEN probe model as a pure
    expression: sigmoid(w · x) per row, where x is the L1-normalized
    hashed-feature vector and the <= n_buckets weights ship as a map
    literal — stateless, shuffle-free, structured-streaming-safe (the
    dsir_score_expr idiom applied to the trained classifier). Exact
    same feature math as _features: per-token bucket weights are
    averaged over doc length (sum w[bucket]/len == w · (counts/len)),
    with micro-unit rounding differences <= 1e-6 per feature.

    Train once with logistic_probe + collect_weights, then gate an
    ingest stream into keep/review/drop lanes at arrival time."""
    from ..functions.text import tokens

    pairs = []
    for b, m in sorted(w_micro.items()):
        pairs.append(F.lit(int(b)))
        pairs.append(F.lit(int(m)))
    ts = tokens(text_col)
    if pairs:
        w_map = F.create_map(*pairs)
        bucket_of = lambda t: (
            F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long") % n_buckets
        )
        dot_sum = F.aggregate(
            ts,
            F.lit(0).cast("long"),
            lambda acc, t: acc
            + F.coalesce(w_map[bucket_of(t)], F.lit(0).cast("long")),
        )
    else:
        dot_sum = F.lit(0).cast("long")
    dot = F.when(F.size(ts) == 0, F.lit(0.0)).otherwise(
        dot_sum.cast("double") / F.size(ts).cast("double") / F.lit(1e6)
    )
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-dot)), 6)


