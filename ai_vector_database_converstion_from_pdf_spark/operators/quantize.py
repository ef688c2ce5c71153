"""Embedding quantization — storage/bandwidth scale path.

At 100 TB the embedding column dominates storage (the reference ships
float32 BLOBs, `vector_store.cpp:673-685`; 3072-dim float32 = 12 KB/row).
Symmetric int8 quantization cuts that 4x with ~1e-2 cosine error, and
scan-time dequantization stays a pure codegen'd expression. This is the
standard faiss/SQ8-style scheme expressed relationally:

  scale = max(|x_i|) / 127   (per row; 0-vector → scale 0)
  q_i   = round(x_i / scale) (int8 in [-127, 127])
  x'_i  = q_i * scale

Everything is ANSI-SQL-expressible, so the round-trip is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def quantize_col(vec: Column) -> Column:
    """array<float> → struct(scale double, q array<tinyint>)."""
    absmax = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    scale = absmax / F.lit(127.0)
    q = F.when(scale == 0.0, F.transform(vec, lambda x: F.lit(0).cast("tinyint"))).otherwise(
        F.transform(vec, lambda x: F.round(x.cast("double") / scale).cast("tinyint"))
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_col(qstruct: Column) -> Column:
    """struct(scale, q) → array<double> (reconstruction)."""
    return F.transform(qstruct["q"], lambda v: v.cast("double") * qstruct["scale"])


def quantize(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    return embeddings.select(
        F.col(id_col), quantize_col(F.col(vec_col)).alias("qemb")
    )


def resolve_shortlist(
    embeddings: DataFrame, shortlist: int | str, k: int
) -> int:
    """"auto" -> max(5·k, ceil(2% of N)): the shortlist must scale with
    the corpus's NEAR-TIE density, not stay a constant. Measured on the
    10x clustered fixture (20k vectors, 625-member clusters, r12): the
    fixed 50-deep shortlist keeps the exact top-1 (MRR ~1.0) but loses
    tie ordering — recall@10 0.29 (hamming) / 0.435 (int8) — because
    the quantized stage-1 score cannot rank hundreds of neighbors whose
    true cosines differ by less than the quantization error. Deepening
    the shortlist restores the contract: at 400 (= 2% of 20k) int8
    reaches 0.97 and hamming 0.855, while at 2k vectors the same rule
    resolves to the classic 50. Cluster sizes grow with N when the
    cluster COUNT is fixed, hence proportional-to-N with a 5·k floor."""
    if shortlist == "auto":
        n = embeddings.count()
        return max(5 * k, -(-n // 50))
    return int(shortlist)


def int8_topk_rescore(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    shortlist: int | str = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage retrieval: int8-quantized scoring to a shortlist, exact
    float rescoring of the shortlist only (the SQ8 + refine pattern;
    scale path for the reference's brute-force scan,
    vector_store.cpp:206-237).

    At 100 TB the first stage scans 4x fewer bytes (int8 vs float32) and
    the exact cosine runs over `shortlist` rows instead of the corpus.
    Both stages are deterministic (round-6dp before ranking, id
    tiebreak), so unlike LSH/IVF this approximate path IS oracle-checkable:
    the DuckDB oracle replays the same quantized shortlist.

    Stage 1 score: scale_e * scale_q * sum(q_e[i] * q_q[i]), computed
    JVM-side with zip_with/aggregate — whole-stage codegen, no UDF.

    `shortlist="auto"` scales the cutoff with corpus size (see
    resolve_shortlist): a fixed depth under-ranks near-tie-dense
    corpora (clustered embeddings at scale).
    """
    from ..functions.vector import cosine_rounded, query_vector_lit

    import math

    shortlist = resolve_shortlist(embeddings, shortlist, k)

    # Query-side quantization uses sign(x)*floor(|x|/scale + 0.5) — a
    # half-up rule with no engine ambiguity (Python round() is half-even,
    # DuckDB round() is half-away; floor agrees everywhere).
    q_absmax = max(abs(float(x)) for x in query_vec)
    q_scale = q_absmax / 127.0
    q_ints = (
        [0] * len(query_vec)
        if q_scale == 0.0
        else [
            int(math.floor(abs(float(x)) / q_scale + 0.5))
            * (1 if float(x) >= 0.0 else -1)
            for x in query_vec
        ]
    )
    q_arr = F.array(*[F.lit(int(v)) for v in q_ints])

    qemb = quantize_col(F.col(vec_col))
    isum = F.aggregate(
        F.zip_with(qemb["q"], q_arr, lambda a, b: a.cast("long") * b.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    approx = F.round(qemb["scale"] * F.lit(q_scale) * isum.cast("double"), 6)

    short = (
        embeddings.select(F.col(id_col), F.col(vec_col), approx.alias("approx_score"))
        .orderBy(F.col("approx_score").desc(), F.col(id_col).asc())
        .limit(shortlist)
    )
    exact = short.select(
        F.col(id_col),
        F.col("approx_score"),
        cosine_rounded(F.col(vec_col), query_vector_lit(query_vec)).alias("score"),
    )
    return exact.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def sign_bits_col(vec: Column, dim: int) -> list[Column]:
    """Pack the sign bits of a float vector into ``ceil(dim/64)`` long
    words (bit i of word w set iff vec[w*64+i] >= 0) — the 1-bit/dim
    binary quantization used by binary_topk_rescore. One compact
    ``aggregate`` fold per word, NOT 64 chained CASE terms: a 64-term
    expression tree costs Catalyst ~1.5 s of DRIVER-side optimization
    per query build (measured at sf0.1 — 4x the whole query), while the
    HOF form plans in milliseconds and row-evaluates the same bits.
    Per-bit addends are disjoint bit patterns, so the integer fold can
    never overflow (it is effectively a bitwise OR); shiftleft(1L, 63)
    lands on the sign bit exactly like the two's-complement query word."""
    def fold(base):
        # two-arg lambda via closure: a default-arg third parameter would
        # make PySpark declare a 3-arg lambda, which aggregate() rejects
        return lambda acc, i: acc + F.when(
            F.get(vec, F.lit(base) + i) >= 0,
            F.call_function("shiftleft", F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))

    words = []
    for w in range((dim + 63) // 64):
        nbits = min(64, dim - w * 64)
        word = F.aggregate(
            F.sequence(F.lit(0), F.lit(nbits - 1)),
            F.lit(0).cast("long"),
            fold(w * 64),
        )
        words.append(word)
    return words


def binary_topk_rescore(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    shortlist: int | str = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage retrieval at 1-bit-per-dimension compression: Hamming
    distance between packed sign signatures shortlists ``shortlist``
    rows, exact float cosine re-ranks only those (the binary-quantized
    sibling of int8_topk_rescore; reference brute-force scan analog
    `vector_store.cpp:206-237`).

    At 100 TB the first stage scans 32x fewer bytes than float32 (64
    dims = ONE long word) and the distance is a single
    bit_count(xor(sig, qsig)) per word — no multiply at all, the
    cheapest possible scan kernel, entirely whole-stage codegen. Sign
    quantization is deterministic (no training, no randomness), so like
    the int8 path this approximate entry gets a REAL value oracle: the
    SQL replays sign disagreement counts directly on the float arrays.

    Ranking: (hamming asc, id asc) for the shortlist, then
    (cosine_rounded desc, id asc) for the final k — total orders on
    both stages, so the cutoff is engine-independent.

    Input contract: vectors must be exactly ``dim`` long with no null
    elements. sign_bits_col would otherwise silently pack a missing
    element as a 0 ("negative") bit and inflate the Hamming distance, so
    malformed rows are FILTERED before packing — they can never be
    scored meaningfully and must not claim shortlist slots. (Rows
    ingested through the workspace sink are already dimension-checked;
    this guards the raw-parquet path.)
    """
    from ..functions.vector import cosine_rounded, query_vector_lit

    shortlist = resolve_shortlist(embeddings, shortlist, k)
    dim = len(query_vec)
    well_formed = (F.size(F.col(vec_col)) == dim) & ~F.exists(
        F.col(vec_col), lambda x: x.isNull()
    )
    embeddings = embeddings.filter(well_formed)
    # query signature packed driver-side with the same >= 0 rule
    q_words = []
    for w in range((dim + 63) // 64):
        acc = 0
        for i in range(min(64, dim - w * 64)):
            if float(query_vec[w * 64 + i]) >= 0.0:
                acc |= 1 << i
        if acc >= 1 << 63:  # two's-complement long
            acc -= 1 << 64
        q_words.append(acc)

    sig = sign_bits_col(F.col(vec_col), dim)
    hamming = None
    for w, qw in zip(sig, q_words):
        h = F.bit_count(w.bitwiseXOR(F.lit(qw).cast("long"))).cast("long")
        hamming = h if hamming is None else hamming + h

    short = (
        embeddings.select(F.col(id_col), F.col(vec_col), hamming.alias("hamming"))
        .orderBy(F.col("hamming").asc(), F.col(id_col).asc())
        .limit(shortlist)
    )
    exact = short.select(
        F.col(id_col),
        F.col("hamming"),
        cosine_rounded(F.col(vec_col), query_vector_lit(query_vec)).alias("score"),
    )
    return exact.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def reconstruction_report(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, cos_orig_recon) — cosine between original and reconstructed
    vector, the quantization-quality metric."""
    from ..functions.vector import cosine_rounded

    q = embeddings.select(
        F.col(id_col), F.col(vec_col), quantize_col(F.col(vec_col)).alias("qemb")
    )
    recon = q.withColumn("recon", dequantize_col(F.col("qemb")))
    return recon.select(
        F.col(id_col),
        cosine_rounded(F.col(vec_col), F.col("recon")).alias("cos_recon"),
    )
