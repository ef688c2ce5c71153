"""The flagship composed plan — hybrid retrieval end-to-end.

Reference lifecycle: SURVEY §3.2 / `vector_store.cpp:277-574`. Pipeline:
intent → routing(weights, depth) → [semantic cosine rank ∥ keyword match
rank] → weighted RRF full-outer merge → stability bias → (score desc, id
asc) → top-k.

Deliberately omitted from the batch correctness path (SURVEY §2.4):
the two-layer query cache (Q14 — batch recompute is deterministic), the
latency-EMA degradation ladder (Q6 — serving concern; Spark's analog is
AQE), and the warmup (Q17). MMR/exploration (Q11/Q12) live in
operators/mmr.py and are opt-in, as in the reference
(`SearchOptions.experimentalMmr`).

Scale shape: one pass over the corpus for the semantic branch (codegen'd
cosine + TakeOrdered k-heap, no global sort), one broadcast-probe over the
inverted index for the keyword branch; everything after the two depth-
truncated branch results is a few dozen rows — driver-negligible,
broadcast-joined. No shuffle touches the 100 TB side.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from ..operators import fusion, intent as intent_mod, keyword, semantic


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    query_text: str,
    query_vec: Sequence[float],
    k: int = 5,
    doc_id: str = "doc_id",
    text_col: str = "text",
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    logs: DataFrame | None = None,
    fts_index: DataFrame | None = None,
    chunk_type_col: str | None = None,
    heading_level_col: str | None = None,
    return_fused: bool = False,
    vec_prefilter: DataFrame | None = None,
) -> DataFrame:
    """Returns (id, semantic_rank, keyword_rank, score, text) top-k.

    When the corpus carries chunk metadata (chunk_type / heading_level —
    the workspace `chunks` schema does), the Q9 additive intent boosts
    are applied to semantic-branch rows exactly as the reference does
    (`vector_store.cpp:402-409`); the driver fixtures lack those
    columns, so the flagship oracle path runs without them."""
    it = intent_mod.detect_intent(query_text)
    r = intent_mod.route(it)
    depth = k * r.depth_mult

    corpus = docs.select(F.col(doc_id).alias("id"), F.col(text_col).alias("text"))
    vecs = embeddings.select(F.col(vec_id).alias("id"), F.col(vec_col).alias("vec"))
    if vec_prefilter is not None:
        # ANN-accelerated serving: the semantic branch scores only the
        # prefiltered candidate ids (e.g. an RP-LSH index probe) instead
        # of the whole vector table — candidates are query-sized, so the
        # semi-join broadcasts and the corpus scan prunes map-side.
        # Ranking within candidates is still exact cosine.
        vecs = vecs.join(
            F.broadcast(vec_prefilter.select(F.col(vec_prefilter.columns[0]).alias("id"))),
            "id",
            "left_semi",
        )

    # Semantic branch scores the embedding table ALONE — joining text in
    # here would sort-merge-shuffle two corpus-sized tables per query
    # (the round-1 plan's one flaw). Contract: embedding ids ⊆ doc ids
    # (the workspace stores both in one chunks table, so this holds by
    # construction); any vec-only id would be dropped by the final inner
    # text join regardless.
    sem_scored = semantic.score_cosine(vecs, query_vec, vec_col="vec", out_col="sim")
    sem_with_sim = fusion.rank_branch(
        sem_scored, "sim", "id", "semantic_rank", depth, keep_score=return_fused
    )
    sem_ranked = (
        sem_with_sim.select("id", "semantic_rank") if return_fused else sem_with_sim
    )

    # keyword branch probes the materialized fts_index when provided
    # (heading-augmented postings — reference `vector_store.cpp:195-200`
    # indexes `[CONTEXT: <heading>]` with the body); else tokenizes the
    # corpus inline
    kw = keyword.keyword_search(
        corpus, query_text, depth, id_col="id", text_col="text", fts_index=fts_index
    )
    kw_ranked = (
        kw.select("id", "match_cnt")
        .withColumn(
            "keyword_rank",
            F.row_number()
            .over(Window.orderBy(F.col("match_cnt").desc(), F.col("id").asc()))
            .cast("long"),
        )
        .select("id", "keyword_rank")
    )

    fused = fusion.rrf_fuse(sem_ranked, kw_ranked, r.w_semantic, r.w_keyword)

    # Q9: intent-type boosts on rows that entered via the semantic branch
    # (reference applies them while walking semanticRes). Metadata joins
    # against the tiny fused set — broadcast, no corpus shuffle.
    if chunk_type_col is not None:
        meta_cols = [F.col(doc_id).alias("id"), F.col(chunk_type_col).alias("_ct")]
        if heading_level_col is not None:
            meta_cols.append(F.col(heading_level_col).alias("_hl"))
        meta = docs.select(*meta_cols)
        # inner, not left: every fused id that can survive the final inner
        # text join has a meta row, and Spark can only honor a broadcast
        # hint on the stream side of a LEFT join for the build=right case —
        # inner lets the tiny fused set be the build side (BuildLeft), so
        # the corpus-sized meta is probed map-side, never shuffled
        fused = F.broadcast(fused).join(meta, "id")
        hl = F.coalesce(F.col("_hl"), F.lit(0)) if heading_level_col else F.lit(0)
        boost = fusion.intent_boost_col(it, F.coalesce(F.col("_ct"), F.lit("")), hl)
        fused = fused.withColumn(
            "rrf_score",
            F.col("rrf_score")
            + F.when(F.col("semantic_rank") > 0, boost).otherwise(0.0),
        ).drop("_ct", "_hl")

    stability = fusion.query_stability(logs, query_text)
    scored = fusion.apply_stability_bias(fused, stability, r.stability_mult)

    # fused ids always come from the corpus, so this is semantically a
    # left join but can run as inner with the tiny fused side BROADCAST —
    # the corpus is probed map-side, never shuffled (a left join here
    # would force a sort-merge shuffle of the full corpus to fetch k texts)
    out_cols = ["id", "semantic_rank", "keyword_rank", "score", "text"]
    if return_fused:
        # carry the semantic cosine through (tiny left join between two
        # <=depth-row sets): exploration's 0.65 threshold applies to THIS
        # value, never the fused RRF score (`vector_store.cpp:543-546`)
        scored = scored.join(F.broadcast(sem_with_sim.select("id", "sim")), "id", "left")
        out_cols.append("sim")
    out = (
        F.broadcast(scored)
        .join(corpus, "id")
        .select(*out_cols)
        .orderBy(F.col("score").desc(), F.col("id").asc())
    )
    # return_fused: the FULL fused candidate set (<= 2x depth rows) for
    # callers that post-process before truncating — the reference's MMR
    # and exploration operate on all fused candidates, not the top-k
    # (`vector_store.cpp:460-554` runs before the final resize)
    return out if return_fused else out.limit(k)
