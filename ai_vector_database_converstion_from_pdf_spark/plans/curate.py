"""End-to-end corpus curation — the composed training-data pipeline.

Chains the curation operators a 100 TB pretraining pipeline runs before
tokenization, as ONE declarative plan over the documents table:

  1. near-dup resolution   (ngram-jaccard pairs → connected components,
                            keep one canonical doc per cluster)
  2. quality gate          (Gopher rule family)
  3. repetition gate       (Gopher §A1.1 top-n-gram coverage)
  4. decontamination       (n-gram collision vs the held-out eval split)
  5. PII scrub             (typed markers, map-side regexp only)

Output is the full AUDIT table — one row per input doc with a per-stage
keep flag, the combined `keep`, and the redacted text — so a pipeline
can report WHY every dropped doc dropped (the curation-debugging
contract; same philosophy as gopher_flags' per-rule booleans).

Scale shape: the per-row stages (quality gate, PII scrub, eval-split
flag) are computed in a SINGLE select over one corpus scan — they are
pure expressions, so fusing them costs nothing and saves two
corpus-sized joins plus two extra scans. Only the genuinely aggregate
stages branch: near-dup resolution (pair graph + min-label CC, rounds
bounded by cluster diameter), repetition (one (doc, gram)-keyed agg per
n), and decontamination (shingle join whose contaminated-id output is
doc_id-keyed and tiny). The final assembly is a UNION of the stage
frames + one groupBy(doc_id) zip — a single corpus shuffle, no
sort-merge joins (each output column is non-null in exactly one stage
frame, so first(ignorenulls) reassembles rows deterministically).

Extends the reference's whole-file dedup (`pdf_processor.cpp:409-416`)
to the corpus-curation pipeline its data model implies at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.decontaminate import contaminated_ids
from ..operators.dedup import ngram_jaccard_pairs, resolve_duplicates
from ..operators.textstats import gopher_keep_col, redact_col, repetition_flags


def curate_corpus(
    docs: DataFrame,
    jaccard_threshold: float = 0.8,
    max_doc_freq: int = 50,
    decon_n: int = 5,
    decon_min_hits: int = 2,
    eval_mod: int = 10,
) -> DataFrame:
    """(doc_id, dedup_keep, quality_keep, repetition_keep, decon_keep,
    is_eval, keep, redacted) for every input doc. `keep` = training-set
    membership: not the eval split, canonical in its dup cluster, passes
    both Gopher gates, and shares no eval n-grams."""
    is_eval = F.col("doc_id") % eval_mod == 0

    # Tokenize ONCE, share everywhere: four of the five stages consume
    # the same lowercase-alnum token array (jaccard 3-gram shingles,
    # repetition 2/3-grams + TTR, decon 5-gram shingles — previously
    # each re-scanned the corpus and re-ran the regexp split). One
    # cached (doc_id, text, tokens) projection replaces ~5 corpus scans
    # + tokenizations; at 100 TB this is the "materialize the proxy
    # once" rule (guide §8) applied to the token arrays.
    from ..functions.text import tokens as _tokens

    # NOTE (ADVICE r13): intentionally NOT unpersisted here — the frame
    # is consumed lazily by the returned plan, so there is no in-operator
    # post-action hook; the cache is session-lifetime by design and
    # Spark's LRU evicts it under pressure. (An eager checkpoint instead
    # would race multi-consumer broadcast builds — the r13 matryoshka
    # finding — and persist() keeps the shared-InMemoryRelation plan.)
    toked = docs.select(
        "doc_id", "text", _tokens(F.col("text")).alias("_ts")
    ).persist()

    # per-row stages fused into one scan: quality + PII + split flag
    per_row = toked.select(
        "doc_id",
        gopher_keep_col(F.col("text")).alias("quality_keep"),
        redact_col(F.col("text")).alias("redacted"),
        is_eval.alias("is_eval"),
    )

    resolved = resolve_duplicates(
        toked,
        ngram_jaccard_pairs(
            toked,
            threshold=jaccard_threshold,
            max_doc_freq=max_doc_freq,
            tokens_col="_ts",
        ),
    ).select(F.col("id").alias("doc_id"), (~F.col("is_dup")).alias("dedup_keep"))

    repetition = repetition_flags(toked, tokens_col="_ts").select(
        F.col("id").alias("doc_id"), F.col("keep").alias("repetition_keep")
    )
    contam = contaminated_ids(
        toked.filter(~is_eval),
        toked.filter(is_eval),
        n=decon_n,
        min_hits=decon_min_hits,
        tokens_col="_ts",
    ).select(F.col("train_id").alias("doc_id"), F.lit(False).alias("decon_keep"))

    # Assembly WITHOUT corpus-sized joins: the four stage frames (each
    # keyed by doc_id, ≤1 row per doc per frame) union into one tall
    # frame and a single groupBy(doc_id) zips them back together —
    # first(ignorenulls) is deterministic because each column is non-null
    # in exactly one source frame. ONE exchange on doc_id replaces three
    # corpus-sized sort-merge joins (three full-corpus shuffles + sorts
    # at 100 TB); partial aggregation combines map-side as usual.
    tall = (
        per_row.unionByName(resolved, allowMissingColumns=True)
        .unionByName(repetition, allowMissingColumns=True)
        .unionByName(contam, allowMissingColumns=True)
    )
    return (
        tall.groupBy("doc_id")
        .agg(
            F.first("dedup_keep", ignorenulls=True).alias("dedup_keep"),
            F.first("quality_keep", ignorenulls=True).alias("quality_keep"),
            F.first("repetition_keep", ignorenulls=True).alias("repetition_keep"),
            F.coalesce(
                F.first("decon_keep", ignorenulls=True), F.lit(True)
            ).alias("decon_keep"),
            F.first("is_eval", ignorenulls=True).alias("is_eval"),
            F.first("redacted", ignorenulls=True).alias("redacted"),
        )
        .withColumn(
            "keep",
            ~F.col("is_eval")
            & F.col("dedup_keep")
            & F.col("quality_keep")
            & F.col("repetition_keep")
            & F.col("decon_keep"),
        )
        .select(
            "doc_id",
            "dedup_keep",
            "quality_keep",
            "repetition_keep",
            "decon_keep",
            "is_eval",
            "keep",
            "redacted",
        )
    )
