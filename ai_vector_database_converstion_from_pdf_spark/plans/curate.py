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
broadcast back). The final assembly joins those three small-or-keyed
frames to the per-row frame on doc_id.

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

    # per-row stages fused into one scan: quality + PII + split flag
    per_row = docs.select(
        "doc_id",
        gopher_keep_col(F.col("text")).alias("quality_keep"),
        redact_col(F.col("text")).alias("redacted"),
        is_eval.alias("is_eval"),
    )

    resolved = resolve_duplicates(
        docs, ngram_jaccard_pairs(docs, threshold=jaccard_threshold, max_doc_freq=max_doc_freq)
    ).select(F.col("id").alias("doc_id"), (~F.col("is_dup")).alias("dedup_keep"))

    repetition = repetition_flags(docs).select(
        F.col("id").alias("doc_id"), F.col("keep").alias("repetition_keep")
    )
    contam = contaminated_ids(
        docs.filter(~is_eval), docs.filter(is_eval), n=decon_n, min_hits=decon_min_hits
    ).select(F.col("train_id").alias("doc_id"), F.lit(False).alias("decon_keep"))

    return (
        per_row.join(resolved, "doc_id")
        .join(repetition, "doc_id")
        .join(F.broadcast(contam), "doc_id", "left")
        .withColumn("decon_keep", F.coalesce(F.col("decon_keep"), F.lit(True)))
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
