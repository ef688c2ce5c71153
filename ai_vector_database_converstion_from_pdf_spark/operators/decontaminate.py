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

from .dedup import word_shingles

DEFAULT_N = 13  # the GPT-3 decontamination window


def ngram_contamination(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = DEFAULT_N,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(train_id, eval_id, n_hits) for every train/eval pair sharing >=
    `min_hits` distinct word n-grams. Shingling matches
    `dedup.word_shingles` (lowercased, punctuation-split tokens)."""
    train_sh = word_shingles(train, n=n, id_col=id_col, text_col=text_col)
    eval_sh = word_shingles(eval_docs, n=n, id_col=id_col, text_col=text_col)
    hits = train_sh.join(
        F.broadcast(eval_sh.withColumnRenamed("id", "eval_id")), "shingle"
    )
    # shingles are distinct per doc, so count(*) == distinct collisions
    return (
        hits.groupBy(F.col("id").alias("train_id"), "eval_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )


def contaminated_ids(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = DEFAULT_N,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distinct train doc ids to drop before training (one column:
    `train_id`). Feed to an anti-join against the corpus."""
    return (
        ngram_contamination(train, eval_docs, n, min_hits, id_col, text_col)
        .select("train_id")
        .distinct()
    )
