"""10x scale-up stress for the round-2 scale paths.

Replicates the sf0.1 corpus 10x with shifted ids (every doc gains 9
exact replicas — known planted duplicate structure) and times the ops
whose scale shape changed this round:
- ngram_jaccard_pairs (posting-list pair explosion + hot-shingle cap)
- resolve_duplicates (connected components over the pair graph)
- embedding_near_dup_pairs (streamed blocked-broadcast GEMM; also run
  with a small block_bytes to prove block-count insensitivity)
- pagerank over the 10x simhash near-dup graph, 15 iterations with
  checkpoint-every-5 (lineage stays bounded, driver/executor memory
  flat across iterations)

Usage: python tools/stress10x.py   (appends nothing; prints a table)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.1"
REPLICAS = 10


def main() -> None:
    from pyspark.sql import functions as F

    from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
        embedding_near_dup_pairs,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        resolve_duplicates,
    )
    from ai_vector_database_converstion_from_pdf_spark.session import get_spark

    spark = get_spark("stress10x")
    docs0 = spark.read.parquet(f"{SF}/documents.parquet")
    emb0 = spark.read.parquet(f"{SF}/embeddings.parquet")
    n0 = docs0.count()

    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    docs = (
        docs0.crossJoin(reps)
        .select((F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"), "text")
        .persist()
    )
    emb = (
        emb0.crossJoin(reps)
        .select((F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"), "embedding")
        .persist()
    )
    nd, ne = docs.count(), emb.count()
    print(f"docs {n0} -> {nd}; vectors -> {ne}")

    def timed(label, fn):
        t = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t
        print(f"STRESS {label}: {dt:.1f}s  ({out})")
        return out

    mh_pairs = minhash_lsh_pairs(docs, threshold=0.8).persist()
    timed("minhash_lsh(50k docs)", lambda: f"{mh_pairs.count()} pairs")
    timed(
        "resolve_duplicates(50k docs, LSH pairs)",
        lambda: "{} kept of {}".format(
            resolve_duplicates(docs, mh_pairs).filter(~F.col("is_dup")).count(), nd
        ),
    )
    # cap sized like a real pipeline: ~5x the expected dup-group size.
    # (With the cap at 500 the same run costs ~400s — sum C(df,2) over
    # near-unbounded posting lists; the cap IS the scale control.)
    timed(
        "ngram_jaccard(50k docs, cap=50)",
        lambda: "{} pairs".format(
            ngram_jaccard_pairs(docs, threshold=0.8, max_doc_freq=50).count()
        ),
    )
    timed(
        "gemm near-dup(50k vecs, default 64MB blocks)",
        lambda: f"{embedding_near_dup_pairs(emb, threshold=0.45).count()} pairs",
    )
    timed(
        "gemm near-dup(50k vecs, 4MB blocks)",
        lambda: "{} pairs".format(
            embedding_near_dup_pairs(
                emb, threshold=0.45, block_bytes=4 << 20
            ).count()
        ),
    )

    # PageRank over the 10x near-dup graph: 15 iterations with
    # checkpoint-every-5 — proves lineage/memory stay bounded on deep
    # iterative runs (VERDICT r2 next-round #9)
    from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
        simhash_pairs,
    )
    from ai_vector_database_converstion_from_pdf_spark.operators.graph import pagerank

    sh_pairs = simhash_pairs(docs, max_hamming=3).select("id_a", "id_b").persist()
    timed("simhash pairs(50k docs)", lambda: f"{sh_pairs.count()} pairs")
    sym = sh_pairs.unionByName(
        sh_pairs.select(
            F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")
        )
    )
    timed(
        "pagerank(10x graph, 15 iters, ckpt/5)",
        lambda: "{} ranked nodes".format(
            pagerank(sym, n_iter=15, checkpoint_every=5).count()
        ),
    )

    # substring-level dedup at 10x: with every doc replicated 10x, every
    # span is shared 10 ways — worst-case group density, still one
    # map-only shingling pass + one aggregate (no pairwise join to blow up)
    from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
        duplicate_spans,
    )

    timed(
        "duplicate_spans(50k docs)",
        lambda: f"{duplicate_spans(docs).count()} span groups",
    )

    # fourth-session additions: window-based dedup, exact prefix-filtered
    # all-pairs, O(batch) incremental arrival, LPA over the 10x graph
    from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
        incremental_lsh_pairs,
        ngram_jaccard_prefix_pairs,
        sorted_neighborhood_pairs,
    )
    from ai_vector_database_converstion_from_pdf_spark.operators.graph import (
        label_propagation,
    )

    timed(
        "sorted_neighborhood(50k docs, w=10)",
        lambda: "{} pairs".format(
            sorted_neighborhood_pairs(docs, window=10, threshold=0.9).count()
        ),
    )
    timed(
        "ngram_prefix EXACT all-pairs(50k docs)",
        lambda: "{} pairs".format(
            ngram_jaccard_prefix_pairs(docs, threshold=0.8).count()
        ),
    )
    batch = docs.filter(F.col("doc_id") >= 9_000_000)
    corpus9 = docs.filter(F.col("doc_id") < 9_000_000)
    timed(
        "incremental_lsh(5k batch vs 45k corpus)",
        lambda: "{} cross pairs".format(
            incremental_lsh_pairs(corpus9, batch, threshold=0.8).count()
        ),
    )
    nodes = docs.select(
        F.col("doc_id").alias("id"),
        F.when(F.col("doc_id") % 5 == 0, (F.col("doc_id") % 97).cast("string")).alias(
            "seed"
        ),
    )
    timed(
        "label_propagation(10x graph, 3 rounds)",
        lambda: "{} labeled".format(
            label_propagation(nodes, sh_pairs, n_rounds=3)
            .filter(F.col("label").isNotNull())
            .count()
        ),
    )


def fifth_session() -> None:
    """Fifth-session scale paths over the same 10x corpus: triangles,
    SemDeDup (K scaled so clusters stay bounded), DSIR weighting, the
    logistic probe, and bloom decontamination.
    Usage: python tools/stress10x.py fifth"""
    from pyspark.sql import functions as F

    from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
        semdedup_prune,
        simhash_pairs,
    )
    from ai_vector_database_converstion_from_pdf_spark.operators.decontaminate import (
        bloom_contamination,
    )
    from ai_vector_database_converstion_from_pdf_spark.operators.graph import (
        triangle_counts,
    )
    from ai_vector_database_converstion_from_pdf_spark.operators.linear import (
        logistic_probe,
    )
    from ai_vector_database_converstion_from_pdf_spark.operators.sampling import (
        dsir_importance_weights,
    )
    from ai_vector_database_converstion_from_pdf_spark.session import get_spark

    spark = get_spark("stress10x-5")
    docs0 = spark.read.parquet(f"{SF}/documents.parquet")
    emb0 = spark.read.parquet(f"{SF}/embeddings.parquet")
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    docs = (
        docs0.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
            "text",
            "lang",
        )
        .persist()
    )
    emb = (
        emb0.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"),
            "embedding",
        )
        .persist()
    )
    nd, ne = docs.count(), emb.count()
    print(f"docs -> {nd}; vectors -> {ne}")

    def timed(label, fn):
        t = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t
        print(f"STRESS {label}: {dt:.1f}s  ({out})")
        return out

    sh_pairs = simhash_pairs(docs, max_hamming=3).select("id_a", "id_b").persist()
    timed("simhash pairs(10x docs)", lambda: f"{sh_pairs.count()} pairs")
    # the replica graph is near-clique (avg degree ~1000): EXACT wedges
    # are Theta(sum deg^2) and spill unboundedly — h<=1 gives the exact
    # path a realistic sparser graph, and DOULION sampling (p=0.05,
    # wedge volume down p^2 = 400x) covers the dense one
    sh1_pairs = simhash_pairs(docs, max_hamming=1).select("id_a", "id_b").persist()
    timed("simhash pairs(h<=1)", lambda: f"{sh1_pairs.count()} pairs")
    timed(
        "triangle_counts(10x, h<=1 exact)",
        lambda: "{} nodes on triangles".format(triangle_counts(sh1_pairs).count()),
    )
    timed(
        "triangle_estimate(24M-edge graph, DOULION p=0.05)",
        lambda: "{} nodes estimated".format(
            triangle_counts(sh_pairs, sample_p=0.05).count()
        ),
    )
    # K scaled with N (the SemDeDup guidance): 64 clusters of ~7.8k —
    # per-task GEMM blocks stay MBs, not the 20 GB an n x n matrix
    # over 10-cluster/50k-vector groups would need
    timed(
        "semdedup(500k vecs, K=64)",
        lambda: "{} dup-group rows".format(
            semdedup_prune(emb, n_clusters=64, tau=0.45).count()
        ),
    )
    timed(
        "dsir_weights(500k docs)",
        lambda: "{} weighted docs".format(
            dsir_importance_weights(
                docs, docs.filter(F.col("lang") == "en")
            ).count()
        ),
    )
    timed(
        "logistic_probe(500k docs, 2 iters)",
        lambda: "{} scored docs".format(
            logistic_probe(docs, F.col("lang") == "en", n_iters=2).count()
        ),
    )
    train = docs.filter(F.col("doc_id") % 10 != 0)
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    timed(
        "bloom_decontaminate(450k train vs 50k eval, 2^22 bits)",
        lambda: "{} contaminated pairs".format(
            bloom_contamination(
                train, ev, n=5, min_hits=2, m_bits=1 << 22, n_hashes=2
            ).count()
        ),
    )


def sixth_session() -> None:
    """Round-4 scale paths over the same 10x corpus:
    - triangle auto-dispatch THROUGH the operator (the dense 24M-edge
      replica graph must self-select DOULION and complete — the r3 OOM
      required knowing to pass sample_p manually),
    - the range-partitioned exact global rank / ntile at 500k rows,
    - the winnowing cap decision flow: cap report first, exact only if
      the pair-volume bound says it is affordable.
    Usage: python tools/stress10x.py sixth"""
    from pyspark.sql import functions as F

    from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
        simhash_pairs,
    )
    from ai_vector_database_converstion_from_pdf_spark.operators.graph import (
        triangle_counts,
    )
    from ai_vector_database_converstion_from_pdf_spark.operators.ranking import (
        ntile_from_rank,
        with_global_rank,
    )
    from ai_vector_database_converstion_from_pdf_spark.operators.textstats import (
        winnowing_cap_report,
        winnowing_matches,
    )
    from ai_vector_database_converstion_from_pdf_spark.session import get_spark

    spark = get_spark("stress10x-6")
    docs0 = spark.read.parquet(f"{SF}/documents.parquet")
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    docs = (
        docs0.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"), "text"
        )
        .persist()
    )
    nd = docs.count()
    print(f"docs -> {nd}")

    def timed(label, fn):
        t = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t
        print(f"STRESS {label}: {dt:.1f}s  ({out})")
        return out

    # 1) the dup-dense graph through AUTO dispatch (r3: exact spilled
    # ~50 GB and died; the operator must now survive unattended)
    sh_pairs = simhash_pairs(docs, max_hamming=3).select("id_a", "id_b").persist()
    timed("simhash pairs(10x)", lambda: f"{sh_pairs.count()} pairs")

    def _auto_tri():
        # construction is eager (probe + sampled count + checkpoint), so
        # it belongs INSIDE the timing
        out = triangle_counts(sh_pairs, sample_p="auto")
        assert "triangles_est" in out.columns, "dense graph must auto-sample"
        return f"{out.count()} nodes, col={out.columns[1]}"

    timed("triangle_counts(24M-edge graph, sample_p='auto')", _auto_tri)

    # 2) exact global rank + ntile over 500k rows, no single-partition
    # window anywhere (the doc_length_buckets shape at 100x entities)
    toks = docs.select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens")
    )
    ranked = with_global_rank(
        toks, [("n_tokens", "asc"), ("doc_id", "asc")],
        total_cols={"_total": "count"},
    ).select(
        "doc_id", ntile_from_rank(F.col("rnk"), F.col("_total"), 4).alias("b")
    )
    timed(
        "exact ntile(500k rows, two-level rank)",
        lambda: "{} rows, bucket sizes {}".format(
            nd,
            sorted(
                (r["b"], r["n"])
                for r in ranked.groupBy("b").agg(F.count("*").alias("n")).collect()
            ),
        ),
    )

    # 3) winnowing cap decision flow on the replica corpus: report, then
    # exact only if affordable (the documented pipeline recipe)
    rep = timed(
        "winnowing_cap_report(500k docs, cap=50)",
        lambda: winnowing_cap_report(docs, max_doc_freq=50).collect()[0].asDict(),
    )
    capped = timed(
        "winnowing_matches(500k docs, cap=50)",
        lambda: f"{winnowing_matches(docs, max_doc_freq=50).count()} pairs",
    )
    if rep["pairs_dropped_bound"] <= 50_000_000:
        timed(
            "winnowing_matches(500k docs, EXACT)",
            lambda: f"{winnowing_matches(docs, max_doc_freq=None).count()} pairs",
        )
    else:
        print(
            f"STRESS winnowing EXACT skipped: pair bound "
            f"{rep['pairs_dropped_bound']:,} over budget — the report is "
            f"the point: the cap is mandatory here"
        )


def seventh_session() -> None:
    """Round-4 seventh-session scale paths:
    - semantic decontamination at 10x: ~19.4k corpus vectors x 643 eval
      vectors through the broadcast-GEMM scan (eval side = the
      replicated fixture's % 31 slice — a realistically large
      benchmark suite relative to the 2k-vector embeddings fixture),
    - winnowing auto-dispatch THROUGH the operator on the replica
      corpus: it must detect the 13.6B-pair exact bound and self-apply
      the cap (the sixth-session flow without the human in the loop).
    Usage: python tools/stress10x.py seventh"""
    from pyspark.sql import functions as F

    from ai_vector_database_converstion_from_pdf_spark.operators.decontaminate import (
        semantic_contamination,
    )
    from ai_vector_database_converstion_from_pdf_spark.operators.textstats import (
        winnowing_matches,
    )
    from ai_vector_database_converstion_from_pdf_spark.session import get_spark

    spark = get_spark("stress10x-7")

    def timed(label, fn):
        t = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t
        print(f"STRESS {label}: {dt:.1f}s  ({out})")
        return out

    emb0 = spark.read.parquet(f"{SF}/embeddings.parquet")
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    emb = (
        emb0.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"),
            "embedding",
        )
        .persist()
    )
    n = emb.count()
    ev = emb.filter(F.col("vec_id") % 31 == 0).persist()
    ne = ev.count()
    corpus = emb.filter(F.col("vec_id") % 31 != 0)
    print(f"vectors -> {n} ({ne} eval)")
    timed(
        f"semantic_contamination({n - ne} corpus x {ne} eval)",
        lambda: f"{semantic_contamination(corpus, ev, threshold=0.30).count()} flagged",
    )

    docs0 = spark.read.parquet(f"{SF}/documents.parquet")
    docs = (
        docs0.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"), "text"
        )
        .persist()
    )
    nd = docs.count()
    print(f"docs -> {nd}")
    timed(
        "winnowing_matches(500k docs, max_doc_freq='auto')",
        lambda: f"{winnowing_matches(docs, max_doc_freq='auto').count()} pairs "
        "(expect the capped under-count: the auto probe must refuse exact)",
    )


def eighth_session() -> None:
    """Round-4 eighth-session scale paths:
    - directed containment at 10x: the replica corpus is the worst case
      (every base doc has 9 exact copies -> dense containment cliques);
      the hot-shingle cap (50 > 10 replicas) keeps the planted pairs
      while still bounding any stop-phrase blowup,
    - mutual-kNN at 10x: 20k vectors through the blocked GEMM at the
      cosine floor, then the rank windows + reciprocity join; each
      vector's replicas occupy its top-k, so the mutual set is the
      replica structure — proving the window/join stages hold at the
      inflated candidate volume.
    Usage: python tools/stress10x.py eighth"""
    from pyspark.sql import functions as F

    from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
        containment_pairs,
        embedding_near_dup_pairs,
    )
    from ai_vector_database_converstion_from_pdf_spark.session import get_spark

    spark = get_spark("stress10x-8")

    def timed(label, fn):
        t = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t
        print(f"STRESS {label}: {dt:.1f}s  ({out})")
        return out

    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    docs0 = spark.read.parquet(f"{SF}/documents.parquet")
    docs = (
        docs0.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"), "text"
        )
        .persist()
    )
    nd = docs.count()
    print(f"docs -> {nd}")
    timed(
        f"containment_pairs({nd} docs, tau=0.9, cap=50)",
        lambda: f"{containment_pairs(docs, threshold=0.9, max_doc_freq=50).count()} directed pairs",
    )

    emb0 = spark.read.parquet(f"{SF}/embeddings.parquet")
    emb = (
        emb0.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"),
            "embedding",
        )
        .persist()
    )
    ne = emb.count()
    print(f"vectors -> {ne}")

    def mutual():
        from ai_vector_database_converstion_from_pdf_spark.operators.similarity import (
            mutual_knn_pairs_from,
        )

        pairs = embedding_near_dup_pairs(emb, threshold=0.25)
        return mutual_knn_pairs_from(pairs, k=3).count()

    timed(f"mutual_knn({ne} vectors, k=3, tau=0.25)", lambda: f"{mutual()} mutual pairs")


def ninth_session() -> None:
    """Round-4 ninth-session scale paths:
    - bounded BFS over the 10x dup-dense simhash graph (the 24M-edge
      monster that kills exact triangle counting): 4 frontier levels
      must stay join-shaped — no frontier blowup beyond the reachable
      set, no driver state,
    - leakage-safe split at 10x: CC over the LSH pair graph + map-side
      split for 500k docs (the dedup_resolution path with the split
      expression on top).
    Usage: python tools/stress10x.py ninth"""
    from pyspark.sql import functions as F

    from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
        minhash_lsh_pairs,
        resolve_duplicates,
        simhash_pairs,
    )
    from ai_vector_database_converstion_from_pdf_spark.operators.graph import (
        bfs_hops,
    )
    from ai_vector_database_converstion_from_pdf_spark.session import get_spark

    spark = get_spark("stress10x-9")

    def timed(label, fn):
        t = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t
        print(f"STRESS {label}: {dt:.1f}s  ({out})")
        return out

    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    docs0 = spark.read.parquet(f"{SF}/documents.parquet")
    docs = (
        docs0.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"), "text"
        )
        .persist()
    )
    nd = docs.count()
    print(f"docs -> {nd}")

    sh_pairs = (
        simhash_pairs(docs, max_hamming=3).select("id_a", "id_b").persist()
    )
    ne = sh_pairs.count()
    print(f"simhash edges -> {ne}")
    seeds = docs.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("id")
    )
    timed(
        f"bfs_hops(4 levels over {ne} edges)",
        lambda: f"{bfs_hops(sh_pairs, seeds, max_hops=4).count()} reached",
    )

    def split():
        pairs = minhash_lsh_pairs(docs, threshold=0.8)
        canon = resolve_duplicates(docs, pairs).select(
            F.col("id").alias("doc_id"), "canonical_id"
        )
        h = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("split-v1:"),
                            F.col("canonical_id").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 100
        )
        out = canon.select(
            "doc_id",
            F.when(h < 90, "train").when(h < 95, "val").otherwise("test").alias(
                "split"
            ),
        )
        return {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}

    timed(f"leakage_safe_split({nd} docs, LSH clusters)", split)



def tenth_session() -> None:
    """Round-4 tenth-session scale paths (fifth-session additions):
    - KN bigram surprisal over 500k docs (~29M bigram events, three
      vocab-sized count joins -- the LM-filter scan shape),
    - SymSpell fuzzy search over the 500k-doc posting list (variant
      generation is vocab-sized, postings join is corpus-sized),
    - matryoshka recall sweep at 20k vectors x 20 queries x 4 dims
      (one corpus scan for all slices),
    - link prediction: the sum(deg^2) wedge probe REFUSES the 24M-edge
      dup-dense graph (same decision flow as triangles/winnowing);
      after dropping hub nodes (deg > 64 -- hubs score ~0 jaccard and
      add no signal) the exact pass runs.
    Usage: python tools/stress10x.py tenth"""
    from pyspark.sql import functions as F

    from ai_vector_database_converstion_from_pdf_spark.operators.graph import (
        link_prediction,
    )
    from ai_vector_database_converstion_from_pdf_spark.operators.keyword import (
        fuzzy_search,
    )
    from ai_vector_database_converstion_from_pdf_spark.operators.similarity import (
        matryoshka_recall,
    )
    from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
        simhash_pairs,
    )
    from ai_vector_database_converstion_from_pdf_spark.operators.textstats import (
        kn_bigram_surprisal,
    )
    from ai_vector_database_converstion_from_pdf_spark.session import get_spark

    spark = get_spark("stress10x-10")

    def timed(label, fn):
        t = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t
        print(f"STRESS {label}: {dt:.1f}s  ({out})")
        return out

    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    docs0 = spark.read.parquet(f"{SF}/documents.parquet")
    docs = (
        docs0.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"), "text"
        )
        .persist()
    )
    nd = docs.count()
    print(f"docs -> {nd}")

    timed(
        f"kn_bigram_surprisal({nd} docs)",
        lambda: f"{kn_bigram_surprisal(docs).count()} scored",
    )
    timed(
        f"fuzzy_search({nd} docs, 3 typo terms)",
        lambda: f"top20 ready, {fuzzy_search(docs, ['mrge', 'tabel', 'jion'], 20, id_col='doc_id', text_col='text').count()} rows",
    )

    emb0 = spark.read.parquet(f"{SF}/embeddings.parquet")
    emb = (
        emb0.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"),
            "embedding",
        )
        .persist()
    )
    nv = emb.count()
    timed(
        f"matryoshka_recall({nv} vectors, 20 queries, dims 8/16/32/64)",
        lambda: {
            r["dim"]: r["recall"]
            for r in matryoshka_recall(emb, n_queries=20).collect()
        },
    )

    sh_pairs = (
        simhash_pairs(docs, max_hamming=3).select("id_a", "id_b").persist()
    )
    ne = sh_pairs.count()
    print(f"simhash edges -> {ne}")
    und = sh_pairs.select(F.col("id_a").alias("src")).unionAll(
        sh_pairs.select(F.col("id_b").alias("src"))
    )
    deg = und.groupBy("src").agg(F.count("*").alias("deg")).persist()
    wedge_bound = deg.agg(
        F.sum(F.col("deg") * F.col("deg")).alias("w")
    ).collect()[0]["w"]
    budget = 5e8
    print(
        f"STRESS link_pred wedge probe: sum(deg^2)={wedge_bound:.3g} "
        f"{'> budget %g -> exact REFUSED' % budget if wedge_bound > budget else '-> exact ok'}"
    )
    if wedge_bound > budget:
        keep = deg.filter(F.col("deg") <= 64).select(F.col("src").alias("id"))
        capped = (
            sh_pairs.join(keep.withColumnRenamed("id", "id_a"), "id_a")
            .join(keep.withColumnRenamed("id", "id_b"), "id_b")
            .select("id_a", "id_b")
            .persist()
        )
        nc = capped.count()
        timed(
            f"link_prediction(hub-capped deg<=64: {nc} edges of {ne})",
            lambda: f"top {link_prediction(capped, top_k=50).count()} pairs",
        )

def hundredx() -> None:
    """100x tier (VERDICT r6 next-round #6): 500k docs / 200k vectors /
    10M events — one more order of magnitude than every prior stress
    row, to prove the probe-then-dispatch discipline and the linear
    scale paths hold at the next order. Every op prints JVM heap used
    after the run (flat-memory evidence) and the 1-min loadavg.

    The replica corpus is deliberately adversarial for pair-generation:
    every doc has 99 EXACT copies, so every LSH/simhash bucket is a
    100-clique and candidate volume grows ~10,000x, not 100x. The 100 TB
    answer is staged dedup — probe the bucket volume, refuse the direct
    pair expansion, exact-collapse first (hash groupBy, linear), THEN
    run near-dup search on canonicals. This session executes that
    decision flow end to end, plus the linear-path ops at full 100x.
    Usage: python tools/stress10x.py hundredx"""
    import os

    from pyspark.sql import functions as F

    from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
        exact_dedup,
        lsh_band_keys,
        minhash_lsh_pairs,
        minhash_signatures,
        resolve_duplicates,
        semdedup_prune,
        word_shingles,
    )
    from ai_vector_database_converstion_from_pdf_spark.operators.decontaminate import (
        bloom_contamination,
    )
    from ai_vector_database_converstion_from_pdf_spark.operators.keyword import (
        fuzzy_search,
    )
    from ai_vector_database_converstion_from_pdf_spark.operators.langid import (
        lang_id_trigram,
    )
    from ai_vector_database_converstion_from_pdf_spark.operators.ranking import (
        ntile_from_rank,
        with_global_rank,
    )
    from ai_vector_database_converstion_from_pdf_spark.session import get_spark

    spark = get_spark("stress100x")
    jvm_rt = spark._jvm.java.lang.Runtime.getRuntime()

    def heap_mb() -> int:
        return int((jvm_rt.totalMemory() - jvm_rt.freeMemory()) / (1 << 20))

    def timed(label, fn):
        t = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t
        print(
            f"STRESS100 {label}: {dt:.1f}s  ({out})  "
            f"[heap {heap_mb()} MB, load {os.getloadavg()[0]:.1f}]"
        )
        return out

    R = 100
    reps = spark.range(R).select(F.col("id").alias("rep"))
    docs0 = spark.read.parquet(f"{SF}/documents.parquet")
    docs = (
        docs0.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
            "text",
        )
        .persist()
    )
    nd = docs.count()
    print(f"docs -> {nd} (heap {heap_mb()} MB)")

    # 1) exact dedup at 500k: the linear hash-groupBy stage that makes
    # everything downstream affordable. Planted structure: 100 copies
    # per group.
    groups = exact_dedup(docs).persist()
    timed(
        f"exact_dedup({nd} docs)",
        lambda: "{} groups, max group {}".format(
            groups.count(),
            groups.agg(F.max("dup_cnt")).collect()[0][0],
        ),
    )

    # 2) LSH bucket-volume probe on the RAW 500k corpus: count-only
    # aggregate over band buckets, sum C(size,2) — the pair expansion a
    # direct run would pay. On 100-clique buckets this lands in the
    # billions -> direct minhash REFUSED, staged path dispatched.
    sh = word_shingles(docs).persist()
    bands = lsh_band_keys(minhash_signatures(sh))
    bound_row = timed(
        "lsh bucket-volume probe(500k docs)",
        lambda: bands.groupBy("band", "band_key")
        .agg(F.count("*").alias("n"))
        .agg(
            F.sum(F.expr("n * (n - 1) / 2")).cast("long").alias("pair_bound"),
            F.max("n").alias("max_bucket"),
        )
        .collect()[0]
        .asDict(),
    )
    budget = 100_000_000
    if bound_row["pair_bound"] > budget:
        print(
            f"STRESS100 direct minhash REFUSED: candidate bound "
            f"{bound_row['pair_bound']:,} > budget {budget:,} "
            f"(max bucket {bound_row['max_bucket']}) -> staged dedup"
        )
        keepers = groups.select(F.col("keeper_id").alias("doc_id")).join(
            docs, "doc_id"
        ).persist()
        nk = keepers.count()
        timed(
            f"staged minhash_lsh({nk} canonicals after exact collapse)",
            lambda: "{} near-dup pairs".format(
                minhash_lsh_pairs(keepers, threshold=0.8).count()
            ),
        )
        timed(
            f"staged resolve_duplicates({nk} canonicals)",
            lambda: "{} kept".format(
                resolve_duplicates(
                    keepers, minhash_lsh_pairs(keepers, threshold=0.8)
                )
                .filter(~F.col("is_dup"))
                .count()
            ),
        )
    else:
        timed(
            "minhash_lsh(500k docs, direct)",
            lambda: f"{minhash_lsh_pairs(docs, threshold=0.8).count()} pairs",
        )
    sh.unpersist()

    # 3) embeddings at 200k: brute all-pairs GEMM is ~N^2*dim = 2.6e12
    # FLOPs -- probe the bound, refuse, dispatch the published scale
    # path (SemDeDup cluster-scoped pair search, cost sum c_i^2).
    emb0 = spark.read.parquet(f"{SF}/embeddings.parquet")
    emb = (
        emb0.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"),
            "embedding",
        )
        .persist()
    )
    nv = emb.count()
    dim = len(emb.select("embedding").first()[0])
    flops = nv * nv * dim
    print(
        f"vectors -> {nv}; brute GEMM bound {flops:.2e} FLOPs "
        f"{'-> REFUSED, cluster-scoped path' if flops > 1e11 else '-> ok'}"
    )
    timed(
        f"semdedup({nv} vecs, K=256, cluster-scoped pairs)",
        lambda: "{} dup-group rows".format(
            semdedup_prune(emb, n_clusters=256, tau=0.45).count()
        ),
    )

    # 4) exact global rank + ntile over 10M event rows (two-level rank,
    # never a single-partition window)
    ev0 = spark.read.parquet(f"{SF}/events.parquet")
    ev = (
        ev0.crossJoin(reps)
        .select(
            (F.col("event_id") + F.col("rep") * 100_000_000).alias("event_id"),
            "value",
        )
        .persist()
    )
    nev = ev.count()
    ranked = with_global_rank(
        ev, [("value", "asc"), ("event_id", "asc")],
        total_cols={"_total": "count"},
    ).select(
        "event_id", ntile_from_rank(F.col("rnk"), F.col("_total"), 10).alias("b")
    )
    timed(
        f"exact ntile({nev} events, two-level rank)",
        lambda: "10 buckets, sizes min/max {}".format(
            ranked.groupBy("b")
            .agg(F.count("*").alias("n"))
            .agg(F.min("n"), F.max("n"))
            .collect()[0][:]
        ),
    )

    # 5) bloom decontamination at 450k train / 50k eval, 2^24 bits
    train = docs.filter(F.col("doc_id") % 10 != 0)
    evd = docs.filter(F.col("doc_id") % 10 == 0)
    timed(
        "bloom_decontaminate(450k train vs 50k eval, 2^24 bits)",
        lambda: "{} contaminated pairs".format(
            bloom_contamination(
                train, evd, n=5, min_hits=2, m_bits=1 << 24, n_hashes=2
            ).count()
        ),
    )

    # 6) depth-2 SymSpell fuzzy search over the 500k-doc posting list
    # (variant generation is vocab-sized; Heaps' law keeps it flat under
    # replication)
    timed(
        f"fuzzy_search({nd} docs, depth-2 variants)",
        lambda: "top20 ready, {} rows".format(
            fuzzy_search(
                docs, ["mrge", "tabel", "jion"], 20,
                id_col="doc_id", text_col="text",
            ).count()
        ),
    )

    # 7) trigram language ID at 500k docs: ONE shuffle-free mapInPandas
    # pass (profiles ride the closure)
    timed(
        f"lang_id_trigram({nd} docs)",
        lambda: "{} docs classified, {} langs".format(
            nd,
            lang_id_trigram(docs)
            .select("lang_pred")
            .distinct()
            .count(),
        ),
    )

    # 8) round-7 additions at the tier: the per-source dashboard (one
    # source-keyed agg) and triplet mining (3 queries broadcast into one
    # 200k-vector scan) — both linear by construction, proven here
    from ai_vector_database_converstion_from_pdf_spark.operators.similarity import (
        training_triplets,
    )

    from ai_vector_database_converstion_from_pdf_spark.functions.text import (
        tokens as _tokens,
    )

    docs_src = docs.withColumn(
        "source", F.concat(F.lit("s"), (F.col("doc_id") % 20).cast("string"))
    )

    def _report_rows():
        ts = _tokens(F.col("text"))
        return (
            docs_src.select(
                "source",
                F.md5("text").alias("h"),
                F.size(ts).cast("long").alias("n_tok"),
            )
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.countDistinct("h").alias("n_uniq"),
                F.sum("n_tok").alias("total_tokens"),
            )
            .count()
        )

    timed(
        f"corpus_source_report shape({nd} docs, 20 sources)",
        lambda: f"{_report_rows()} source rows",
    )
    no_pairs = spark.createDataFrame([], "id_a long, id_b long")
    timed(
        f"training_triplets({nv} vectors, 3 anchors)",
        lambda: "{} triplets".format(
            training_triplets(emb, no_pairs, [0, 7, 42]).count()
        ),
    )

    # 9) round-8: link_prediction's IN-OPERATOR sum(deg^2) auto-gate on
    # the planted 100-clique dup graph (every doc + its 99 exact copies
    # -> union of 5000 100-cliques, ~24.75M edges, sum(deg^2) ~ 4.9e9
    # >> the 5e8 budget). The UNGATED wedge self-join on this shape is
    # the plan that spilled ~50 GB and died for exact triangles
    # (BASELINE.md); center_cap="auto" probes, caps each center at
    # sqrt(budget/n) neighbors, and completes.
    from ai_vector_database_converstion_from_pdf_spark.operators.graph import (
        link_prediction,
    )

    hd = docs.select(F.md5("text").alias("h"), "doc_id").persist()
    bridge = docs0.select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b")
    )
    clique = (
        hd.alias("x")
        .join(hd.alias("y"), "h")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b")
        )
        # sparse chain overlay linking consecutive base docs: pure
        # disjoint cliques have NO non-adjacent wedge pairs (every
        # 2-path closes), so without it the run would prove only
        # completion, not output
        .unionByName(bridge)
        .distinct()
        .persist()
    )
    ncl = clique.count()
    timed(
        f"link_prediction(center_cap='auto', {ncl} clique+chain edges)",
        lambda: "top {} pairs (auto-capped; ungated plan spills)".format(
            link_prediction(clique, top_k=50, center_cap="auto").count()
        ),
    )
    clique.unpersist()
    hd.unpersist()

    # 10) round-8: batched BPE merge rounds at a REAL vocabulary scale
    # (VERDICT r7 #4). The parquet fixture's text has only ~31 distinct
    # words — useless for tokenizer training — so the vocabulary here is
    # synthetic-but-Zipf: ~100k distinct hex words, freq ~ 1/rank.
    # batch_size=16 accepts the maximal symbol-disjoint prefix per
    # count round; merges that chain through minted symbols cap the
    # average acceptance (~1.8/round on hex text), still ~1.8x fewer
    # driver round-trips than the sequential loop at n_merges=256.
    from ai_vector_database_converstion_from_pdf_spark.operators.bpe import (
        bpe_train,
    )

    wf = (
        spark.range(100_000)
        .select(
            F.substring(
                F.md5(F.col("id").cast("string")),
                1,
                (F.pmod(F.col("id"), F.lit(12)) + 4).cast("int"),
            ).alias("word"),
            (F.lit(1_000_000) / (F.col("id") + 1)).cast("long").alias("freq"),
        )
        .groupBy("word")
        .agg(F.sum("freq").alias("freq"))
        .filter(F.col("freq") >= 1)
        .persist()
    )
    nw = wf.count()
    timed(
        f"bpe_train({nw} Zipf vocab words, n_merges=256, batch_size=16)",
        lambda: f"{len(bpe_train(wf, n_merges=256, batch_size=16)[0])} merges",
    )
    timed(
        f"bpe_train({nw} Zipf words, n=256, bs=16, accept='scan')",
        lambda: "{} merges (skip-and-scan independent set)".format(
            len(bpe_train(wf, n_merges=256, batch_size=16, accept="scan")[0])
        ),
    )
    wf.unpersist()

    # 11) round-8 (VERDICT r7 #7): the GEMM-riding ops now carry their
    # OWN probes at the tier.
    #
    # mutual-kNN: method="auto" refuses brute GEMM in-operator (200k ×
    # dim 64 = 2.56e12 FLOPs > 1e11). On THIS corpus the LSH fallback's
    # candidate volume is itself adversarial — every bucket is a stack
    # of 100-cliques (~3e8 candidate pairs, measured by the same
    # count-only bucket probe as minhash §2) — so the staged discipline
    # applies verbatim: exact-collapse identical vectors first (linear
    # hash-groupBy), then mutual-kNN auto on the canonicals (under the
    # FLOP budget → exact GEMM). Mutual-kNN on raw exact-dup corpora is
    # semantically noise anyway: every vector's top-k is its own
    # replicas (the 10x eighth-session observation).
    from ai_vector_database_converstion_from_pdf_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )
    from ai_vector_database_converstion_from_pdf_spark.operators.similarity import (
        matryoshka_recall,
        mutual_knn_pairs_from,
        rp_lsh_buckets,
    )

    vdim = len(emb.select("embedding").first()[0])
    print(
        f"STRESS100 mutual_knn in-operator probe: N^2*dim = "
        f"{float(nv) * nv * vdim:.3g} FLOPs > 1e11 -> brute GEMM refused "
        f"(embedding_near_dup_pairs method='auto' warns + dispatches)"
    )
    lsh_bound = (
        rp_lsh_buckets(emb, vdim, 8, 4)
        .groupBy("table", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.expr("n * (n - 1) / 2")).cast("long").alias("b"))
        .collect()[0]["b"]
    )
    print(
        f"STRESS100 mutual_knn LSH bucket probe: candidate bound "
        f"{lsh_bound:,} pairs on the 100-replica corpus -> staged path "
        f"(exact-collapse first, the minhash discipline)"
    )
    canon = (
        emb.groupBy(F.md5(F.col("embedding").cast("string")).alias("h"))
        .agg(
            F.min("vec_id").alias("vec_id"),
            F.first("embedding").alias("embedding"),
            F.count(F.lit(1)).alias("replicas"),
        )
        .drop("h")
        .persist()
    )
    nc2 = canon.count()

    def _mutual_staged():
        pairs = embedding_near_dup_pairs(canon, threshold=0.25, method="auto")
        return (
            f"{mutual_knn_pairs_from(pairs, k=3).count()} mutual pairs on "
            f"{nc2} canonicals (auto -> exact GEMM under budget)"
        )

    timed(f"mutual_knn(staged: {nv} -> {nc2} canonicals)", _mutual_staged)
    canon.unpersist()

    # matryoshka_recall's own probe: 200k × 20 queries × Σdims=120 =
    # 4.8e8 slice-cosine evals > the 2e8 budget → deterministic
    # corpus-sample estimate engages in-operator (logged), bounded wall.
    timed(
        f"matryoshka_recall({nv} vectors, sampled-estimate path)",
        lambda: {
            r["dim"]: r["recall"] for r in matryoshka_recall(emb).collect()
        },
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "fifth":
        fifth_session()
    elif len(sys.argv) > 1 and sys.argv[1] == "sixth":
        sixth_session()
    elif len(sys.argv) > 1 and sys.argv[1] == "seventh":
        seventh_session()
    elif len(sys.argv) > 1 and sys.argv[1] == "eighth":
        eighth_session()
    elif len(sys.argv) > 1 and sys.argv[1] == "ninth":
        ninth_session()
    elif len(sys.argv) > 1 and sys.argv[1] == "tenth":
        tenth_session()
    elif len(sys.argv) > 1 and sys.argv[1] == "hundredx":
        hundredx()
    else:
        main()
