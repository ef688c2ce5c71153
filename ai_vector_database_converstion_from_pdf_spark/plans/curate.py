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

Scale shape: stages 2/3/5 are expression-only or (doc, gram)-keyed
aggregates; stage 4 broadcasts the tiny contaminated-id set; stage 1 is
the only iterative piece (min-label propagation, rounds bounded by
component diameter). The final assembly joins everything on doc_id, so
AQE plans one co-partitioned shuffle chain; the contaminated-id join is
an explicit broadcast.

Extends the reference's whole-file dedup (`pdf_processor.cpp:409-416`)
to the corpus-curation pipeline its data model implies at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.decontaminate import contaminated_ids
from ..operators.dedup import ngram_jaccard_pairs, resolve_duplicates
from ..operators.textstats import gopher_flags, redact_pii, repetition_flags


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

    resolved = resolve_duplicates(
        docs, ngram_jaccard_pairs(docs, threshold=jaccard_threshold, max_doc_freq=max_doc_freq)
    ).select(F.col("id").alias("doc_id"), (~F.col("is_dup")).alias("dedup_keep"))

    quality = gopher_flags(docs).select(
        "doc_id", F.col("keep").alias("quality_keep")
    )
    repetition = repetition_flags(docs).select(
        F.col("id").alias("doc_id"), F.col("keep").alias("repetition_keep")
    )
    contam = contaminated_ids(
        docs.filter(~is_eval), docs.filter(is_eval), n=decon_n, min_hits=decon_min_hits
    ).select(F.col("train_id").alias("doc_id"), F.lit(False).alias("decon_keep"))

    pii = redact_pii(docs).select(F.col("id").alias("doc_id"), "redacted")

    return (
        docs.select("doc_id")
        .join(resolved, "doc_id")
        .join(quality, "doc_id")
        .join(repetition, "doc_id")
        .join(F.broadcast(contam), "doc_id", "left")
        .join(pii, "doc_id")
        .withColumn("decon_keep", F.coalesce(F.col("decon_keep"), F.lit(True)))
        .withColumn("is_eval", is_eval)
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
