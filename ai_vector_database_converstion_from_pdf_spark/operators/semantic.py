"""Q1/Q2 — brute-force semantic top-k over an embedding column.

Reference: `VectorStore::search` (`vector_store.cpp:206-237`): full table
scan, cosine vs every row, sort desc, truncate. Spark-first shape: the
cosine is a codegen'd expression over a columnar Parquet scan (only the
id + vector columns are read — column pruning the reference never had),
and `orderBy(...).limit(k)` plans as TakeOrderedAndProject: each partition
keeps a k-heap, the driver merges — no global sort shuffle, O(N·dim) map
work + O(parts·k) merge. That is exactly the plan you want at 100 TB.

Determinism: rank on cosine rounded to 6 decimals, ties broken by id asc
(SURVEY §4 numeric note).
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.vector import cosine_rounded, query_vector_lit


def score_cosine(
    df: DataFrame,
    query_vec: Sequence[float] | Column,
    vec_col: str = "embedding",
    out_col: str = "score",
    digits: int = 6,
) -> DataFrame:
    if isinstance(query_vec, Column):
        return df.withColumn(out_col, cosine_rounded(F.col(vec_col), query_vec, digits))
    # literal query vector: fold its norm driver-side so the scan does
    # dot + one row-norm per row instead of three 64-element aggregates
    # (the q-norm aggregate over a literal array is not constant-folded
    # by Catalyst) — 1/3 less expression work on the hot path
    import math

    from ..functions.vector import dot, l2_norm

    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    q = query_vector_lit(query_vec)
    v = F.col(vec_col)
    denom = l2_norm(v) * F.lit(qn)
    cos = F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(v, q) / denom)
    return df.withColumn(out_col, F.round(cos, digits))


def semantic_topk(
    df: DataFrame,
    query_vec: Sequence[float] | Column,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: Iterable[str] = (),
) -> DataFrame:
    """Top-k rows by cosine(query, embedding); (score desc, id asc)."""
    scored = score_cosine(df, query_vec, vec_col=vec_col)
    cols = [id_col, *extra_cols, "score"]
    return (
        scored.select(*cols)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    method: str = "auto",
    broadcast_bytes: int = 8 << 20,
    block_bytes: int = 16 << 20,
    n_queries: int | None = None,
) -> DataFrame:
    """Brute-force k-NN for a *set* of query vectors. Two plans, one
    probe (r13, VERDICT r12 #4 — the former single plan's ceiling was
    ~20-query eval batches; real eval suites and hard-negative mining
    run 10⁴-10⁵ queries):

    method="bnlj": broadcast the query side (small), score every
    (query, corpus) pair map-side with the codegen'd cosine, keep
    top-k per query with a window. One corpus scan regardless of query
    count — right while n_queries·dim·8 fits the broadcast budget, but
    the HOF-expression cosine evaluates per (row, query) PAIR at
    interpreted rate, and the window shuffles N·n_queries scored rows.

    method="blocked": the eval-scale plan — the `dedup.py` block idiom
    applied to query×corpus. Query blocks of ≤block_bytes stream
    through the driver once (toLocalIterator), each block broadcasts
    as a numpy matrix, and every corpus Arrow batch does ONE BLAS GEMM
    against the block, emitting only each query's per-batch top-k
    (k rows per query per batch — the union over batches provably
    contains the global top-k, which a final per-query window
    extracts). Shuffle volume drops from N·n_queries scored rows to
    ~k·n_queries·n_batches candidate rows.

    method="auto": bnlj only for SMALL query sets — n_queries ≤ 32 AND
    n_queries·dim·8 bytes within `broadcast_bytes`; everything else
    takes the blocked plan (logged). The flip point is measured, not
    assumed: at a 20k-row corpus, 50 queries already run 23.6 s under
    BNLJ vs 3.2 s blocked (the HOF cosine evaluates per PAIR at
    interpreted rate — the byte budget alone was the wrong gate), while
    at a 2k-row corpus BNLJ wins below ~32 queries (0.59 s vs 0.73 s at
    20) on python-worker overhead. Pass `n_queries` to skip the probe's
    count() when the caller already knows it.

    Output (q_id, c_id, score, knn_rank) — identical rows from both
    plans: scores rounded to 6 (np.round and F.round agree on these
    values — the same contract the GEMM near-dup path oracles ride),
    ties broken by id asc. Per-query parity bnlj==blocked is pinned in
    tests/test_knn_batch.py and stress-checked at 10k queries by
    tools/stress_knn_batch.py.
    """
    from pyspark.sql import Window

    if method == "auto":
        nq = queries.count() if n_queries is None else int(n_queries)
        if nq <= 32 and nq * 4096 * 8 <= broadcast_bytes:
            # small query set (measured crossover ~32-64 queries at a
            # 2k corpus; blocked wins 7x by 50 queries at 20k) AND it
            # fits the broadcast budget even at a conservative
            # 4096-dim bound — no probe job needed (knn_multi passes
            # n_queries=5 and pays ZERO extra jobs)
            method = "bnlj"
        else:
            import logging

            logging.getLogger(__name__).warning(
                "knn_join auto-dispatch: %d queries — switching to the "
                "blocked query×corpus GEMM plan (per-slice top-k "
                "candidates, exact parity; BNLJ's per-pair interpreted "
                "cosine measured 7x slower by 50 queries at a 20k-row "
                "corpus)",
                nq,
            )
            method = "blocked"
    if method == "bnlj":
        pairs = corpus.crossJoin(F.broadcast(queries))
        scored = pairs.withColumn(
            "score", cosine_rounded(F.col(c_vec), F.col(q_vec))
        )
        w = Window.partitionBy(q_id).orderBy(
            F.col("score").desc(), F.col(c_id).asc()
        )
        return (
            scored.withColumn("knn_rank", F.row_number().over(w).cast("long"))
            .filter(F.col("knn_rank") <= k)
            .select(q_id, c_id, "score", "knn_rank")
        )
    if method != "blocked":
        raise ValueError(f"knn_join: unknown method {method!r}")

    import numpy as np
    import pandas as pd

    side = corpus.select(
        F.col(c_id).alias("id"), F.col(c_vec).alias("v")
    ).filter(F.col("v").isNotNull())
    # widen thin scans: the GEMM parallelizes over scan partitions, and
    # a one-file parquet corpus would run the whole product on one core
    # (the embedding_near_dup_pairs idiom — Catalyst stats estimate,
    # no job)
    import math

    spark = corpus.sparkSession
    _size = side._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    est_bytes = _size if isinstance(_size, int) else int(_size.toString())
    try:
        max_part = int(
            str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
            .lower()
            .rstrip("b")
        )
    except ValueError:
        max_part = 134217728
    target_parts = spark.sparkContext.defaultParallelism
    if max(1, math.ceil(est_bytes / max_part)) < target_parts:
        side = side.repartition(target_parts)
    qside = queries.select(
        F.col(q_id).alias("qid"), F.col(q_vec).alias("qv")
    ).filter(F.col("qv").isNotNull())
    kk = int(k)

    def make_block(block_rows: list):
        qids_b = np.array([r["qid"] for r in block_rows], dtype=np.int64)
        Q = np.array([list(r["qv"]) for r in block_rows], dtype=np.float64)
        qn = np.linalg.norm(Q, axis=1)
        qn[qn == 0.0] = np.inf
        Qn = (Q / qn[:, None]).T  # dim × nq, ready for the batch GEMM
        bc = corpus.sparkSession.sparkContext.broadcast((qids_b, Qn))

        def scan(batches, _bc=bc):
            qids_r, Qt = _bc.value
            nq = len(qids_r)
            # slice the Arrow batch so the score matrix stays ~64 MB
            # (slice_rows × nq doubles) — without this, a 10k-query
            # block against a 10k-row Arrow batch materializes an
            # 800 MB matrix PER TASK and the host thrashes (the same
            # bound the near-dup GEMM kernel applies)
            slice_rows = max(256, (8 << 20) // max(nq, 1))
            for pdf in batches:
                if not len(pdf):
                    continue
                Vfull = np.stack(pdf["v"].to_numpy()).astype(np.float64)
                vn = np.linalg.norm(Vfull, axis=1)
                vn[vn == 0.0] = np.inf
                Vfull = Vfull / vn[:, None]
                ids_full = pdf["id"].to_numpy()
                for lo in range(0, len(Vfull), slice_rows):
                    hi = lo + slice_rows
                    ids = ids_full[lo:hi]
                    S = np.round(Vfull[lo:hi] @ Qt, 6)  # slice × nq
                    take = min(kk, len(ids))
                    # per-query per-slice top-k by (score desc, id asc):
                    # rows pre-sorted by id so the stable sort breaks
                    # score ties toward smaller ids. Sort the TRANSPOSE
                    # row-wise — a per-COLUMN argsort on the
                    # C-contiguous score matrix strides the full row
                    # width per element access and ran ~100x slower at
                    # 10k queries (measured: minutes vs seconds).
                    order_ids = np.argsort(ids, kind="stable")
                    NegT = np.ascontiguousarray(-S[order_ids].T)  # nq×rows
                    idxT = np.argsort(NegT, axis=1, kind="stable")[:, :take]
                    scoresT = -np.take_along_axis(NegT, idxT, axis=1)
                    rsel = order_ids[idxT]  # (nq × take) row indices
                    yield pd.DataFrame(
                        {
                            "qid": np.repeat(qids_r, take),
                            "cid": ids[rsel].reshape(-1),
                            "score": scoresT.reshape(-1),
                        }
                    )

        return side.mapInPandas(scan, "qid long, cid long, score double")

    out = None
    buf: list = []
    buf_bytes = 0
    for row in qside.toLocalIterator():
        buf.append(row)
        buf_bytes += 8 * len(row["qv"]) + 16
        if buf_bytes >= block_bytes:
            part = make_block(buf)
            out = part if out is None else out.unionByName(part)
            buf, buf_bytes = [], 0
    if buf:
        part = make_block(buf)
        out = part if out is None else out.unionByName(part)
    if out is None:
        return corpus.sparkSession.createDataFrame(
            [], f"{q_id} long, {c_id} long, score double, knn_rank long"
        )
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("cid").asc()
    )
    return (
        out.withColumn("knn_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("knn_rank") <= kk)
        .select(
            F.col("qid").alias(q_id),
            F.col("cid").alias(c_id),
            "score",
            "knn_rank",
        )
    )
