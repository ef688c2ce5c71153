"""RAKE keyword extraction (Rose et al., "Automatic Keyword Extraction
from Individual Documents", 2010) over the corpus.

Extends the reference's text-analysis surface (it stops at FTS ranking,
`vector_store.cpp:240-275`): candidate phrases are maximal stopword-free
token runs; each word scores deg(w)/freq(w) where freq counts its
occurrences across all phrases and deg additionally credits the length
of every phrase it appears in (co-occurrence degree); a phrase scores
the sum of its words' scores. Top phrases = the corpus's salient
multi-word terminology — the keyword-mining complement to tfidf_top_terms
(which is unigram and per-doc).

Determinism contract: word scores are deg/freq (one exact-integer
division), rounded to 6 and scaled to integer micro-units before the
per-phrase sum — so phrase-score accumulation is integer and
order-independent across engines; the final /1e6 is exact.

Scale shape: phrase construction is one per-doc window (running stop
count partitions token runs) + one (doc, phrase_id) aggregate — all
doc-keyed, uniform. Word stats are a vocab-sized aggregate; phrase
scores a phrase-vocab-sized aggregate joined to word scores on the word
key. No corpus-sized self-joins anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from ..functions.text import tokens
from .textstats import STOPWORDS


def candidate_phrases(
    docs: DataFrame,
    max_len: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, phrase, words, plen) — one row per phrase OCCURRENCE.
    Phrase = maximal run of consecutive non-stopword tokens, length
    capped at max_len (longer runs are dropped, per RAKE's convention
    of distrusting very long candidates)."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    t = docs.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("ts")
    )
    pos = t.select(
        "id", F.posexplode("ts").alias("i", "tok")
    ).withColumn("is_stop", F.array_contains(sw, F.col("tok")))
    # running count of stopwords up to and including this position
    # partitions each doc's token stream into stopword-free runs
    pid = F.count(F.when(F.col("is_stop"), F.lit(1))).over(
        W.partitionBy("id").orderBy("i")
    )
    ph = (
        pos.withColumn("pid", pid)
        .filter(~F.col("is_stop"))
        .groupBy("id", "pid")
        .agg(F.sort_array(F.collect_list(F.struct("i", "tok"))).alias("st"))
        .select(
            "id", F.transform("st", lambda s: s["tok"]).alias("words")
        )
        .filter((F.size("words") >= 1) & (F.size("words") <= max_len))
    )
    return ph.select(
        "id",
        F.array_join("words", " ").alias("phrase"),
        "words",
        F.size("words").alias("plen"),
    )


def rake_keywords(
    docs: DataFrame,
    top_k: int = 30,
    max_len: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level RAKE: (phrase, n_occurrences, score) for the top_k
    phrases by summed word score (deg/freq), ties broken by phrase."""
    phr = candidate_phrases(docs, max_len, id_col, text_col)
    wstat = (
        phr.select(F.explode("words").alias("w"), "plen")
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("plen").alias("deg"),
        )
    )
    # integer micro-units: round(deg/freq, 6) * 1e6 — exact, so the
    # per-phrase sum below is order-independent
    wscore = wstat.select(
        "w",
        F.round(
            F.round(F.col("deg").cast("double") / F.col("freq"), 6) * 1e6
        )
        .cast("long")
        .alias("wsi"),
    )
    dphr = phr.groupBy("phrase", "words").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    return (
        dphr.select("phrase", "n_occurrences", F.explode("words").alias("w"))
        .join(wscore, "w")
        .groupBy("phrase", "n_occurrences")
        .agg(F.round(F.sum("wsi") / 1e6, 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("phrase"))
        .limit(top_k)
    )
