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