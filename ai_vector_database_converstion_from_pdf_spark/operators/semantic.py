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

    method="auto": n_queries·dim·8 bytes ≤ broadcast_bytes → bnlj,
    else blocked (logged). Pass `n_queries` to skip the probe's
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
        if nq * 4096 * 8 <= broadcast_bytes:
            # even at a conservative 4096-dim bound the query side fits
            # the broadcast budget — skip the dim-probe job entirely
            # (the repeat-caller idiom: knn_multi passes n_queries=5
            # and pays ZERO probe jobs)
            d, est = None, 0.0
        else:
            first = queries.select(F.size(F.col(q_vec)).alias("d")).first()
            d = int(first["d"]) if first else 0
            est = float(nq) * float(d) * 8.0
        if est > float(broadcast_bytes):
            import logging

            logging.getLogger(__name__).warning(
                "knn_join auto-dispatch: query side ≈ %.3g bytes "
                "(%d queries × %d dims) exceeds the %.3g broadcast "
                "budget — switching to the blocked query×corpus GEMM "
                "plan (per-batch top-k candidates, exact parity)",
                est, nq, d, float(broadcast_bytes),
            )
            method = "blocked"
        else:
            method = "bnlj"
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
            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
                vn = np.linalg.norm(V, axis=1)
                vn[vn == 0.0] = np.inf
                ids = pdf["id"].to_numpy()
                S = np.round((V / vn[:, None]) @ Qt, 6)  # rows × nq
                take = min(kk, len(ids))
                # per-query per-batch top-k by (score desc, id asc):
                # argsort the (-score, id) lexicographic order per column
                order_ids = np.argsort(ids, kind="stable")
                Ss = S[order_ids]  # rows sorted by id asc
                idx = np.argsort(-Ss, axis=0, kind="stable")[:take]
                rsel = order_ids[idx]  # (take × nq) row indices
                yield pd.DataFrame(
                    {
                        "qid": np.tile(qids_r, take),
                        "cid": ids[rsel].reshape(-1),
                        "score": S[rsel, np.arange(nq)[None, :]].reshape(-1),
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
