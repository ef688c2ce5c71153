"""Train/eval decontamination: n-gram collision detection.

Standard LLM-pipeline step (GPT-3 appendix C / PaLM-style 13-gram
overlap): a training document is contaminated if it shares at least
`min_hits` word n-grams with any benchmark/eval document. Extends the
reference's whole-file dedup (docId = MD5(name+"_"+size),
`pdf_processor.cpp:409-416`) to cross-corpus content overlap.

Scale shape (the part that matters at 100 TB): the training corpus is
scanned ONCE and exploded into shingles map-side; the eval set (always
tiny next to training data) is broadcast, so the join is a broadcast
hash join with no shuffle of the training side. Only collision rows —
a vanishing fraction — reach the final (train_id, eval_id) aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.vector import long_array_lit
from .dedup import word_shingles

DEFAULT_N = 13  # the GPT-3 decontamination window


def _verify_hits(
    train_sh: DataFrame, eval_sh: DataFrame, min_hits: int
) -> DataFrame:
    """Shared exact-verify tail: broadcast-join the eval shingles onto
    the (possibly prefiltered) training shingles and keep pairs with >=
    min_hits distinct collisions. Both the exact and the bloom path end
    here — one definition, so the bloom path's 'byte-identical results'
    guarantee can't silently drift."""
    hits = train_sh.join(
        F.broadcast(eval_sh.withColumnRenamed("id", "eval_id")), "shingle"
    )
    # shingles are distinct per doc, so count(*) == distinct collisions
    return (
        hits.groupBy(F.col("id").alias("train_id"), "eval_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )


def ngram_contamination(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = DEFAULT_N,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """(train_id, eval_id, n_hits) for every train/eval pair sharing >=
    `min_hits` distinct word n-grams. Shingling matches
    `dedup.word_shingles` (lowercased, punctuation-split tokens)."""
    train_sh = word_shingles(
        train, n=n, id_col=id_col, text_col=text_col, tokens_col=tokens_col
    )
    eval_sh = word_shingles(
        eval_docs, n=n, id_col=id_col, text_col=text_col, tokens_col=tokens_col
    )
    return _verify_hits(train_sh, eval_sh, min_hits)


def bloom_contamination(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = DEFAULT_N,
    min_hits: int = 1,
    m_bits: int = 1 << 20,
    n_hashes: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bloom-prefiltered decontamination — EXACT same result as
    ngram_contamination, with a membership bitmap standing in for the
    broadcast eval shingle set.

    Why it exists: ngram_contamination broadcasts the eval shingles as
    STRINGS. A large eval suite (hundreds of benchmarks x 13-gram
    windows) is GBs of broadcast; a Bloom bitmap of m_bits is m/8 bytes
    regardless of shingle length (2^20 bits = 128 KiB). The price is
    false positives, which the exact verify join removes — so the bloom
    stage is pure pruning, never semantics.

    Plan shape at 100 TB: eval shingles hash to k bit positions
    (JVM-side xxhash64 — the SAME hash the probe side computes, no
    Python/JVM hash mismatch possible); positions fold executor-side
    into m/64 packed 64-bit words (one word-keyed bit_or aggregate), so
    the driver collects a frame the size of the BITMAP — never the
    positions, never the strings. The training corpus is scanned ONCE;
    an Arrow-batched pandas UDF tests the k precomputed positions per
    shingle against the packed bitset, and only bloom-positive rows —
    true hits + the FP fraction (~(1-e^(-kn/m))^k) — reach the exact
    broadcast-verify join (`_verify_hits`, shared with the exact path).
    The training side never shuffles.
    """
    import numpy as np

    train_sh = word_shingles(train, n=n, id_col=id_col, text_col=text_col)
    # eval shingles are computed twice (bitmap-build action + the exact
    # verify broadcast) — persist so the tokenize/shingle/distinct pass
    # over the eval slice runs once
    eval_sh = word_shingles(
        eval_docs, n=n, id_col=id_col, text_col=text_col
    ).persist()

    def positions(col):
        # k independent hashes via salted xxhash64; pmod keeps [0, m)
        return F.array(
            *[
                F.pmod(
                    F.xxhash64(F.concat(col, F.lit(f"#bloom{j}"))), F.lit(m_bits)
                ).cast("long")
                for j in range(n_hashes)
            ]
        )

    # bitmap build: positions fold into packed words EXECUTOR-side —
    # the driver sees <= m/64 (word, bits) rows (bitmap-sized), not up
    # to m position rows
    words = (
        eval_sh.select(F.explode(positions(F.col("shingle"))).alias("p"))
        .select(
            (F.col("p") / 64).cast("long").alias("w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("p") % 64).cast("int")
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    n_words = (m_bits + 63) // 64
    packed = np.zeros(n_words, dtype=np.uint64)
    for r in words:
        packed[r.w] = np.uint64(r.bits & 0xFFFFFFFFFFFFFFFF)

    # membership test as a pure JVM expression (guide §4.1: built-ins
    # over UDFs — this removed the only Python boundary on the training
    # side): the packed bitmap ships as ONE array<long> plan literal
    # (m/8 bytes, same size contract as the old python broadcast), each
    # hash position tests its word via element_at + shiftleft mask.
    # Arithmetic-vs-logical shift is irrelevant: the mask isolates one
    # bit below the sign extension. Bit layout is identical to the
    # pandas-UDF path (word = p >> 6, bit = p & 63), so the survivor
    # set — true hits + the same FP fraction — is byte-identical.
    # long_array_lit: ONE py4j call for the whole bitmap instead of one
    # per 64-bit word (r14, the query_vector_lit fix)
    words_lit = long_array_lit(
        int(w) if w < (1 << 63) else int(w) - (1 << 64) for w in packed
    )
    hit = None
    for j in range(n_hashes):
        p = F.pmod(
            F.xxhash64(F.concat(F.col("shingle"), F.lit(f"#bloom{j}"))),
            F.lit(m_bits),
        ).cast("long")
        word = F.element_at(words_lit, F.shiftright(p, 6).cast("int") + F.lit(1))
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.pmod(p, F.lit(64)).cast("int")
        )
        test = word.bitwiseAND(mask) != F.lit(0).cast("long")
        hit = test if hit is None else (hit & test)

    survivors = train_sh.filter(hit if hit is not None else F.lit(True))
    return _verify_hits(survivors, eval_sh, min_hits)


def contaminated_ids(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = DEFAULT_N,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """Distinct train doc ids to drop before training (one column:
    `train_id`). Feed to an anti-join against the corpus."""
    return (
        ngram_contamination(
            train, eval_docs, n, min_hits, id_col, text_col, tokens_col
        )
        .select("train_id")
        .distinct()
    )


def semantic_contamination(
    corpus: DataFrame,
    eval_vecs: DataFrame,
    threshold: float = 0.30,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space decontamination: flag corpus vectors whose cosine
    to ANY eval vector reaches `threshold` — the semantic sibling of
    `ngram_contamination` for paraphrased/reworded benchmark leakage
    that shares no 13-gram. Output: (id, n_eval_matches, max_cos), one
    row per contaminated corpus vector.

    Scale shape mirrors the n-gram path's broadcast asymmetry: the eval
    suite is always tiny next to training data, so the normalized eval
    matrix broadcasts whole and the corpus streams through one
    shuffle-free mapInPandas GEMM scan (per-batch flops = batch x eval —
    linear in corpus size, BLAS rate). Numerics follow
    dedup.embedding_near_dup_pairs: float64 normalize (zero-norm rows
    can never match), round(cos, 6) before the threshold compare so the
    oracle's dot/(norm*norm) form agrees."""
    import numpy as np
    import pandas as pd

    eval_rows = eval_vecs.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).collect()  # eval-suite-sized: the deliberate, documented collect
    E = np.array([list(r["v"]) for r in eval_rows], dtype=np.float64)
    if len(E) == 0:
        return corpus.sparkSession.createDataFrame(
            [], f"{id_col} long, n_eval_matches long, max_cos double"
        )
    en = np.linalg.norm(E, axis=1)
    nz = en > 0
    En = np.zeros_like(E)
    En[nz] = E[nz] / en[nz, None]
    thr = float(threshold)
    side = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            an = np.linalg.norm(A, axis=1)
            anz = an > 0
            An = np.zeros_like(A)
            An[anz] = A[anz] / an[anz, None]
            cos = np.round(An @ En.T, 6)
            hits = cos >= thr
            n = hits.sum(axis=1)
            keep = n > 0
            if not keep.any():
                continue
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy()[keep],
                    "n_eval_matches": n[keep].astype("int64"),
                    "max_cos": cos[keep].max(axis=1),
                }
            )

    out = side.mapInPandas(score, "id long, n_eval_matches long, max_cos double")
    return out.withColumnRenamed("id", id_col)
