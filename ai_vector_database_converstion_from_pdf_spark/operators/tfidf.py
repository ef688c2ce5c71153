"""Corpus TF-IDF: per-document top terms by tf·idf.

Extends the keyword layer (`operators/keyword.py`, reference analog
FTS5/BM25 in `vector_store.cpp:251-262`) with the corpus-statistics view
a curation pipeline uses for topic profiling and keyword extraction.

Scale design: one explode + two map-side-combinable groupBys. The
document-frequency table is vocab-sized (≪ corpus; Heaps' law), so its
join back onto the (doc, term) counts is AQE-broadcastable; corpus size
N arrives via a broadcast 1-row aggregate, never a driver collect. The
only corpus-wide shuffles are keyed on term — no skew beyond natural
Zipf, which AQE skew-join handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import tokens


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Top-k terms per doc by smoothed tf·idf:
    score = tf * (ln((N+1)/(df+1)) + 1), rounded to 6 decimals before
    ranking (FIXTURES.md §C); ties break alphabetically.
    """
    toks = docs.select(
        F.col("doc_id"), F.explode(tokens(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))

    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1.0))
                        / (F.col("df") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "tfidf", "rank")
    )


def doc_similarity_topk(
    docs: DataFrame,
    k: int = 20,
    max_df: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k most-similar document pairs by sparse TF-IDF cosine —
    the weighted-vector sibling of the set-overlap dedup family
    (dedup_ngram_prefix is exact Jaccard; this is exact cosine over
    tf·idf term weights). Returns (id_a, id_b, cos_sim), id_a < id_b.

    Semantics (part of the definition, replayed by the oracle):
    * term weight = round(tf * (ln((N+1)/(df+1)) + 1), 6), the same
      smoothed idf as tfidf_top_terms, then scaled to integer
      micro-units BEFORE any sum — dot products and norms are exact
      integer arithmetic, so float accumulation order can't drift
      between engines (the decayed-engagement idiom).
    * terms with df > max_df carry no weight (standard stopword-band
      pruning; at Zipf scale the hottest terms contribute ~0 idf but
      O(df^2) join rows — the cap is what keeps the posting-list
      self-join sub-quadratic, exactly the hot-shingle cap of the
      Jaccard path).

    Scale shape: one scan -> (doc, term, weight) postings; the
    vocab-sized df table joins back AQE-broadcast; the pair dot
    product is ONE equi-join on term over df-capped postings + one
    (id_a, id_b) aggregate; norms are node-sized and broadcast-join
    onto the pair aggregate. Products accumulate in DECIMAL(38,0) so
    hundred-page docs can't overflow the micro-unit sums."""
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))

    w = (
        tf.join(dfreq, "term")
        .filter(F.col("df") <= max_df)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "term",
            F.round(
                F.round(
                    F.col("tf")
                    * (
                        F.log(
                            (F.col("n_docs") + F.lit(1.0))
                            / (F.col("df") + F.lit(1.0))
                        )
                        + F.lit(1.0)
                    ),
                    6,
                )
                * F.lit(1e6)
            )
            .cast("long")
            .alias("mi"),
        )
    )
    mdec = F.col("mi").cast("decimal(19,0)")
    norms = w.groupBy("id").agg(
        F.sum(mdec * mdec).cast("decimal(38,0)").alias("nsq")
    )
    a = w.select(F.col("id").alias("id_a"), "term", F.col("mi").alias("ma"))
    b = w.select(F.col("id").alias("id_b"), "term", F.col("mi").alias("mb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(
                F.col("ma").cast("decimal(19,0)") * F.col("mb").cast("decimal(19,0)")
            )
            .cast("decimal(38,0)")
            .alias("dot")
        )
    )
    scored = (
        dots.join(
            norms.select(F.col("id").alias("id_a"), F.col("nsq").alias("nsq_a")),
            "id_a",
        )
        .join(
            norms.select(F.col("id").alias("id_b"), F.col("nsq").alias("nsq_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("nsq_a").cast("double"))
                    * F.sqrt(F.col("nsq_b").cast("double"))
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    return scored.orderBy(
        F.col("cos_sim").desc(), F.col("id_a").asc(), F.col("id_b").asc()
    ).limit(k)


def corpus_ngram_counts(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide word n-gram occurrence counts — the classic LM-data
    MapReduce workload (and the raw-count sibling of dedup.word_shingles,
    which distincts per doc for Jaccard): (gram, occurrences, doc_freq).

    Scale shape: one scan exploding each doc's n-token windows, then one
    groupBy(gram) with BOTH aggregates (sum of occurrences via count,
    distinct docs via countDistinct) — map-side partial-combined, a
    single shuffle keyed by gram. Hot grams skew the shuffle exactly like
    hot shingles; downstream consumers should threshold or salt if a
    full unthresholded table is needed at 100 TB."""
    from ..functions.text import tokens

    toks = docs.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("ts")
    )
    idx = F.when(
        F.size("ts") >= n, F.sequence(F.lit(0), F.size("ts") - n)
    ).otherwise(F.array().cast("array<int>"))
    grams = toks.select(
        "id",
        F.explode(
            F.transform(idx, lambda i: F.array_join(F.slice("ts", i + 1, n), " "))
        ).alias("gram"),
    )
    return grams.groupBy("gram").agg(
        F.count("*").cast("long").alias("occurrences"),
        F.countDistinct("id").cast("long").alias("doc_freq"),
    )
