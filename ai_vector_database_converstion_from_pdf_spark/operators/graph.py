"""Generic connected components over an edge list — the shared core of
single-link dedup-cluster resolution (text or embedding edges).

Iterative min-label propagation: each round joins labels across the
symmetric edge list and keeps the minimum neighbor label — labels move
one hop per round, so convergence takes O(cluster diameter) rounds.
Dup clusters are near-cliques (diameter ~2), so 2-3 rounds in practice.
Each round is one shuffle keyed by id; the edge list is persisted once.
This is the standard large-graph CC shape (GraphFrames' label
propagation without the dependency)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    max_iters: int = 20,
) -> DataFrame:
    """(id, component) where component = min node id reachable from `id`.
    `nodes`: one column of ids (singletons keep their own id);
    `edges`: (id_a, id_b) undirected pairs."""
    sym = (
        edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .persist()
    )
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("label"))
    for _ in range(max_iters):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = labels.join(
            neighbor_min, labels.id == neighbor_min.src, "left"
        ).select(
            "id",
            F.least(
                F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
            ).alias("label"),
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels.persist()
        if changed == 0:
            break
    return labels.select("id", F.col("label").alias("component"))

def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 5,
    round_digits: int = 12,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (id_a → id_b;
    callers union both directions for undirected graphs, which also
    guarantees every node has in-edges so no mass silently vanishes).

    Determinism contract: ranks are rounded to `round_digits` after
    every iteration in BOTH engines (the DuckDB oracle replays the same
    recursion), so float summation-order noise (~1e-16) can never
    accumulate across iterations.

    Scale shape: per iteration, one join of ranks onto the edge list
    (both keyed by src — co-partitioned after the first shuffle) and one
    groupBy(dst) combine; the rank/degree tables are node-sized, edges
    dominate. For many iterations, checkpoint every ~5 to cut lineage.
    """
    # persist the edge list: every iteration re-joins it, and without
    # materialization each action would replay the upstream pair
    # pipeline (LSH/simhash candidate generation) n_iter times over
    sym = edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).persist()
    deg = sym.groupBy("src").agg(F.count("*").alias("outdeg")).persist()
    nodes = sym.select(F.col("src").alias("id")).distinct().persist()
    n = nodes.count()  # scalar aggregate (sanctioned driver-side surface)
    base = float(1.0 - damping) / n
    ranks = nodes.select("id", F.round(F.lit(1.0 / n), round_digits).alias("rank"))
    for _ in range(n_iter):
        contrib = (
            sym.join(ranks.withColumnRenamed("id", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
        )
        ranks = contrib.groupBy("id").agg(
            F.round(
                F.lit(base) + F.lit(damping) * F.sum("c"), round_digits
            ).alias("rank")
        )
    return ranks
