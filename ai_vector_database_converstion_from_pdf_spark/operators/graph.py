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

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.storagelevel import StorageLevel

# THE wedge budget: the Σdeg² bound above which exact wedge generation
# is replaced by capping (common_neighbor_counts/link_prediction) or
# DOULION sampling (triangle_counts). One shared constant — the
# catalog's shared wedge memo gates on the same value, so the two
# sides cannot be retuned apart (ADVICE r9).
AUTO_WEDGE_BUDGET = 5e8


def compact_checkpoint(
    df: DataFrame, rows_per_partition: int | None = None
) -> DataFrame:
    """Eager localCheckpoint + size-derived partition compaction for
    materialize-once frames that many downstream jobs re-scan.

    A checkpointed frame keeps whatever partition count its build plan
    happened to end with (shuffle width, union fan-in) — at small data
    that means dozens of near-empty partitions, and every iterative
    consumer (PageRank/LPA/k-core rounds, per-query re-reads) then pays
    task-scheduling overhead per empty partition per job. Counting the
    materialized frame is ~free, so derive the partition count from the
    DATA SIZE instead: ceil(rows / rows_per_partition), floor 1. The
    knob is rows-based and data-derived — independent of local core
    count, so the same code compacts a 32-row frame to 1 partition
    locally and leaves a 10^10-row frame at thousands of partitions on
    a cluster (SPARK_GRAFT_MEMO_ROWS_PER_PARTITION overrides; default
    2M rows ≈ 30-60 MB for pair/edge-shaped rows, the guide's §2.2
    'fewer, larger partitions' target)."""
    import os as _os

    if rows_per_partition is None:
        rows_per_partition = int(
            _os.environ.get("SPARK_GRAFT_MEMO_ROWS_PER_PARTITION", "2000000")
        )
    cp = df.localCheckpoint(eager=True)
    n = cp.count()
    k = max(1, -(-n // int(rows_per_partition)))
    try:
        cur = cp.rdd.getNumPartitions()
    except Exception:
        return cp
    return cp.coalesce(k) if k < cur else cp


def bounded_checkpoint(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint with the partition count capped at default
    parallelism — the count-free sibling of compact_checkpoint for
    PER-ROUND loop frames (k-core peels, quotient peels), where union
    accumulation otherwise grows the stored partition count by a full
    shuffle width per round (32 → 65 → 97 near-empty tasks for every
    downstream job). coalesce() merges without a shuffle and the cap is
    the cluster's own parallelism, so at scale (partitions >= cores
    already) this is byte-for-byte the old behavior."""
    sc = df.sparkSession.sparkContext
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df.localCheckpoint(eager=True)
    p = sc.defaultParallelism
    return (df.coalesce(p) if p < cur else df).localCheckpoint(eager=True)


def wedge_probe(edges: DataFrame) -> tuple[DataFrame, int, int]:
    """THE Σdeg² dispatch probe, single implementation (ADVICE r9):
    one node-sized degree aggregate over a canonical undirected pair
    frame (id_a, id_b) plus a scalar sum. Returns
    (degree_df(id, deg), sum_deg_squared, n_nodes). Every wedge-volume
    gate — triangle_counts 'auto', common_neighbor_counts 'auto', and
    the catalog's shared _cn_pairs memo — reads this one function, so
    the exact-vs-capped/sampled criterion cannot drift between them."""
    deg = (
        edges.select(F.col("id_a").alias("id"))
        .unionByName(edges.select(F.col("id_b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    stats = deg.agg(
        F.sum(F.col("deg") * F.col("deg")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    return deg, int(stats["s"] or 0), int(stats["n"] or 0)


def _cc_driver_labels(edge_rows) -> dict:
    """Union-find (path compression + union-by-min) over a collected
    edge list: {id: min id reachable}. Union-by-min makes every root
    the minimum id of its component — the same label rule as the
    distributed loop."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for r in edge_rows:
        a, b = r[0], r[1]
        if a is None or b is None:
            # null endpoints would break the < comparisons below; the
            # distributed loop drops them via its equi-joins, so skip
            continue
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {x: find(x) for x in parent}


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    max_iters: int = 20,
) -> DataFrame:
    """(id, component) where component = min node id reachable from `id`.
    `nodes`: one column of ids (singletons keep their own id);
    `edges`: (id_a, id_b) undirected pairs. HARD CONTRACT: every edge
    endpoint must appear in `nodes` (all in-repo callers derive edges
    from the node frame). The driver fast path propagates through every
    collected endpoint, while the distributed loop blocks propagation
    at ids absent from `nodes` — under the contract the two are
    identical; null endpoints are dropped by both.

    Dispatch (r13, the probe-then-dispatch idiom): duplicate-pair /
    contamination graphs are usually FAR smaller than the corpora they
    come from, but the synchronous min-label loop pays one full
    join+agg+convergence job PER ROUND regardless — 20-60 jobs for a
    graph that fits in one driver page. A single limit(B+1).collect()
    probe (one action; rows are only used when they are provably the
    ENTIRE edge set) routes graphs of <= B edges to a driver-side
    union-find with identical min-label semantics; bigger graphs take
    the unchanged distributed loop. B defaults to 1M edges (~tens of
    MB collected — model-sized, the kmeans-sample/centroid-collect
    bound) and is env-tunable (SPARK_GRAFT_CC_COLLECT_MAX_EDGES; 0
    disables the fast path)."""
    import os as _os

    budget = int(_os.environ.get("SPARK_GRAFT_CC_COLLECT_MAX_EDGES", "1000000"))
    if budget > 0:
        head = (
            edges.select(F.col("id_a"), F.col("id_b")).limit(budget + 1).collect()
        )
        if len(head) <= budget:
            labels = _cc_driver_labels(head)
            spark = nodes.sparkSession
            node_ids = nodes.select(F.col(id_col).alias("id"))
            if labels:
                id_t = nodes.schema[id_col].dataType.simpleString()
                lab_df = spark.createDataFrame(
                    list(labels.items()), f"id {id_t}, _cc_label {id_t}"
                )
                out = node_ids.join(F.broadcast(lab_df), "id", "left").select(
                    "id",
                    F.coalesce(F.col("_cc_label"), F.col("id")).alias("component"),
                )
            else:
                out = node_ids.select("id", F.col("id").alias("component"))
            # same node-sized eager materialization contract as the
            # distributed branch
            return out.localCheckpoint(eager=True)
    sym = (
        edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .persist()
    )
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("label"))
    cached: list[DataFrame] = []
    try:
        for _ in range(max_iters):
            neighbor_min = (
                sym.join(labels, sym.dst == labels.id)
                .groupBy("src")
                .agg(F.min("label").alias("nlabel"))
            )
            # convergence flag FOLDED into the label frame: `moved` marks
            # rows whose label shrank this round, and the single agg that
            # reads it doubles as the action that materializes the
            # persisted frame. One job per round — no extra
            # labels⋈new_labels probe join (a corpus-sized shuffle per
            # round at 100 TB).
            new_labels = (
                labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
                .select(
                    "id",
                    F.least(
                        F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                    ).alias("label"),
                    (
                        F.coalesce(F.col("nlabel"), F.col("label")) < F.col("label")
                    ).alias("moved"),
                )
                .persist()
            )
            cached.append(new_labels)
            changed = new_labels.agg(
                F.max(F.col("moved").cast("int")).alias("m")
            ).first()[0]
            labels = new_labels.select("id", "label")
            if not changed:
                break
        # node-sized materialization cuts lineage so every upstream cache
        # (edge list + per-round label frames) can be released now — no
        # cached blocks leak across repeated calls in a long session.
        out = labels.select("id", F.col("label").alias("component")).localCheckpoint(
            eager=True
        )
    finally:
        sym.unpersist()
        for df in cached:
            df.unpersist()
    return out

def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 5,
    round_digits: int = 12,
    checkpoint_every: int | None = None,
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
    dominate. For many iterations, pass `checkpoint_every` (~5): the
    node-sized rank frame is localCheckpoint'ed every k rounds, so plan
    lineage stays bounded instead of growing one join+agg layer per
    iteration (values are identical — ranks are already rounded before
    the checkpoint materializes them).
    """
    # persist the edge list: every iteration re-joins it, and without
    # materialization each action would replay the upstream pair
    # pipeline (LSH/simhash candidate generation) n_iter times over.
    # (r14 note: a fan_out_scan here — motivated by the compacted memo
    # arriving at 1 partition so all n_iter broadcast-join edge passes
    # run map-side on it — was interleaved-A/B'd and LOST all 3 rounds
    # (4.18/5.34/7.04 s vs 3.26/5.08/4.99 s): at this scale the added
    # exchange + 5x32 tiny tasks cost more than the serialization.
    # Reverted on that evidence; see OPTIMIZATION_r14.md.)
    sym = edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).persist()
    deg = sym.groupBy("src").agg(F.count("*").alias("outdeg")).persist()
    nodes = sym.select(F.col("src").alias("id")).distinct().persist()
    try:
        n = nodes.count()  # scalar aggregate (sanctioned driver-side surface)
        base = float(1.0 - damping) / n
        ranks = nodes.select(
            "id", F.round(F.lit(1.0 / n), round_digits).alias("rank")
        )
        for i in range(n_iter):
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
            if (
                checkpoint_every
                and (i + 1) % checkpoint_every == 0
                and i + 1 < n_iter
            ):
                ranks = ranks.localCheckpoint(eager=True)
        # node-sized materialization cuts lineage from the (corpus-sized)
        # cached edge frames, so they can be unpersisted here instead of
        # leaking cached blocks across repeated calls (bench loops).
        ranks = ranks.localCheckpoint(eager=True)
    finally:
        sym.unpersist()
        deg.unpersist()
        nodes.unpersist()
    return ranks


def similarity_graph(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Materialized near-duplicate pair table (id_a, id_b) — the shared
    input of the whole graph family (CC, PageRank, LPA, triangles,
    clustering coefficient, k-core).

    Each family member previously regenerated the simhash candidate
    pipeline from the raw corpus (~5 equal pair builds across the
    suite); a real pipeline materializes the pair table ONCE and runs
    every graph analysis against it. localCheckpoint(eager) pins the
    pairs: downstream operators see a plain scan, the candidate
    generation runs exactly once, and iterative consumers don't replay
    it per action. At 100 TB the same role is played by writing the pair
    frame to a workspace table (sinks.Workspace) — the checkpoint is the
    in-session equivalent."""
    from .dedup import simhash_pairs

    return compact_checkpoint(
        simhash_pairs(
            docs, max_hamming=max_hamming, id_col=id_col, text_col=text_col
        ).select("id_a", "id_b")
    )


def triangle_counts(
    edges: DataFrame,
    sample_p: float | str | None = None,
    salt: str = "tri",
    with_degrees: bool = False,
    auto_wedge_budget: float = AUTO_WEDGE_BUDGET,
) -> DataFrame:
    """Per-node triangle participation counts over an undirected pair
    graph: (id, triangles) for every node on >= 1 triangle. The
    clustering-coefficient / community-density primitive next to CC,
    PageRank, and LPA in this module.

    Algorithm: compact-forward (Latapy 2008; the MapReduce formulation
    is Suri & Vassilvitskii's "Counting triangles and the curse of the
    last reducer", WWW'11) — orient every edge from its lower-(degree,
    id) endpoint to the higher one, build wedges only at each edge's
    LOW-degree endpoint, then close wedges against the canonical edge
    set. Orienting by degree bounds the wedge count by
    sum(min_deg(u,v)) per edge instead of sum(deg^2) at hubs — the
    "last reducer" hot-key killer at 100 TB — while leaving the
    triangle SET unchanged, so a plain a<b<c oracle replays it exactly.

    `sample_p`: DOULION edge sampling (Tsourakakis et al., KDD'09) for
    DENSE graphs — keep each canonical edge with probability p via a
    content-stable hash (deterministic, partition-independent), count
    triangles on the sample, scale per-node counts by 1/p^3 (each
    triangle survives iff its 3 edges all survive). On a near-clique
    duplicate graph (every doc + its replicas) the EXACT wedge set is
    Theta(sum deg^2) and spills unboundedly — sampling is the published
    answer, trading a small variance for a p^2 reduction in wedge
    volume. Exact mode returns `triangles` (long); sampled mode returns
    `triangles_est` (double, unbiased).

    `sample_p="auto"`: measure the wedge-volume bound sum(deg^2) from
    the degree aggregate this function builds anyway; below
    `auto_wedge_budget` run EXACT (byte-identical to sample_p=None —
    small/sparse graphs never pay a variance tax), above it switch to
    DOULION with p = sqrt(budget / sum(deg^2)) so the sampled wedge
    volume (~ p^2 * sum deg^2) lands back on budget, and log the switch.
    This is the dense-graph guard: a replica-heavy corpus turns the
    simhash graph into near-cliques where the exact wedge set is
    Theta(sum deg^2) and spills unboundedly (measured: 24M-edge 10x dup
    graph spilled ~50 GB exact, completed sampled — BASELINE.md); auto
    mode makes the catalog entries survive that input without the
    caller knowing to ask.

    with_degrees=True adds every node's degree to the output (full
    outer against the triangle counts, zero-filled) — callers computing
    clustering coefficients reuse the degree aggregate this function
    already builds instead of re-deriving it from the pair frame. In
    SAMPLED mode (explicit sample_p<1 or auto-dispatch) the emitted
    `deg` is always the FULL-graph degree, computed before edge
    filtering: the unbiased 1/p^3 triangle estimate must pair with true
    degrees or 2*tri/(deg*(deg-1)) inflates by ~1/p^2.

    Shape: degree agg (node-sized) broadcast-joinable onto edges, one
    self-join keyed on the wedge apex, one join against canonical
    edges keyed on (min, max) id, one explode + count. No driver-side
    iteration."""
    canon = (
        edges.select(
            F.least("id_a", "id_b").alias("u"), F.greatest("id_a", "id_b").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    deg = None  # orientation degrees (working = possibly sampled edge set)
    emit_deg = None  # FULL-graph degrees for with_degrees output — never sampled
    if sample_p is not None and sample_p != "auto" and with_degrees:
        # explicit sampling: pin full-graph degrees BEFORE filtering, so
        # downstream clustering coefficients pair the unbiased 1/p^3
        # triangle estimate with true degrees (sampled degrees ~ p*deg
        # would inflate 2*tri/(deg*(deg-1)) by ~1/p^2)
        emit_deg = (
            canon.select(F.col("u").alias("id"))
            .union(canon.select(F.col("v")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("deg"))
            .localCheckpoint(eager=True)
        )
    if sample_p == "auto":
        # the shared probe over the persisted canonical edges — one
        # node-sized degree aggregate + scalar sum, one cheap pass
        full_deg, sdeg2, _ = wedge_probe(
            canon.select(F.col("u").alias("id_a"), F.col("v").alias("id_b"))
        )
        if sdeg2 > auto_wedge_budget:
            sample_p = max(0.01, min(1.0, (auto_wedge_budget / sdeg2) ** 0.5))
            if with_degrees:
                # reuse the probe's FULL-graph degree table as the emitted
                # degrees — pairing sampled degrees (~ p*deg) with the
                # 1/p^3-scaled triangle estimate would inflate clustering
                # coefficients by ~1/p^2 (ADVICE r4)
                emit_deg = full_deg.localCheckpoint(eager=True)
            import logging

            logging.getLogger(__name__).warning(
                "triangle_counts auto-dispatch: wedge bound sum(deg^2)=%.3g "
                "exceeds budget %.3g — switching to DOULION sampling with "
                "p=%.4f (unbiased estimates in `triangles_est`)",
                float(sdeg2),
                float(auto_wedge_budget),
                sample_p,
            )
        else:
            sample_p = None
            # staying exact: the probe's degree table IS the orientation
            # degree table — pin it (node-sized) so the two orientation
            # joins below don't re-aggregate it per action
            deg = full_deg.localCheckpoint(eager=True)
    if sample_p is not None:
        if not (0.0 < sample_p <= 1.0):
            raise ValueError(f"sample_p must be in (0, 1], got {sample_p}")
        keep = (
            F.pmod(
                F.xxhash64(
                    F.concat_ws(":", F.lit(salt), F.col("u"), F.col("v"))
                ),
                F.lit(1_000_000),
            )
            < int(sample_p * 1_000_000)
        )
        if sample_p < 1.0:
            sampled = canon.filter(keep).persist()
            sampled.count()  # materialize before releasing the superset
            canon.unpersist()
            canon = sampled
    try:
        if deg is None:  # explicit/sampled path: degrees of the WORKING edge set
            deg = (
                canon.select(F.col("u").alias("id"))
                .union(canon.select(F.col("v")))
                .groupBy("id")
                .agg(F.count("*").alias("deg"))
            )
        with_deg = (
            canon.join(deg.withColumnRenamed("id", "u").withColumnRenamed("deg", "du"), "u")
            .join(deg.withColumnRenamed("id", "v").withColumnRenamed("deg", "dv"), "v")
        )
        # orient low -> high by (degree, id); ties can't loop because ids differ
        oriented = with_deg.select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("src"), F.col("v").alias("dst")),
            )
            .otherwise(F.struct(F.col("v").alias("src"), F.col("u").alias("dst")))
            .alias("e")
        ).select("e.src", "e.dst")

        e1 = oriented.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        e2 = oriented.select(F.col("src").alias("a"), F.col("dst").alias("c"))
        wedges = e1.join(e2, "a").filter(F.col("b") < F.col("c"))
        closed = wedges.join(
            canon,
            (F.least("b", "c") == F.col("u")) & (F.greatest("b", "c") == F.col("v")),
        ).select("a", "b", "c")
        corners = closed.select(
            F.explode(F.array("a", "b", "c")).alias("id")
        )
        if sample_p is None:
            out = corners.groupBy("id").agg(
                F.count("*").cast("long").alias("triangles")
            )
        else:
            out = corners.groupBy("id").agg(
                F.round(
                    F.count("*").cast("double") / F.lit(float(sample_p) ** 3), 3
                ).alias("triangles_est")
            )
        if with_degrees:
            cnt_col = "triangles" if sample_p is None else "triangles_est"
            zero = F.lit(0).cast("long") if sample_p is None else F.lit(0.0)
            deg = emit_deg if emit_deg is not None else deg
            out = deg.join(out, "id", "left").select(
                "id",
                F.coalesce(F.col(cnt_col), zero).alias(cnt_col),
                F.col("deg").cast("long").alias("deg"),
            )
        # node-sized eager materialization (the CC/PageRank idiom): the
        # twice-read canonical edge cache can be released immediately
        # instead of leaking blocks across repeated calls
        return out.localCheckpoint(eager=True)
    finally:
        canon.unpersist()


def label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    n_rounds: int = 3,
) -> DataFrame:
    """Semi-supervised label propagation (Zhu-Ghahramani / Raghavan LPA,
    synchronous variant) over an undirected pair graph: seeded nodes
    keep their label (clamped); every other node adopts the MAJORITY
    label among its labeled neighbors from the previous round (ties ->
    lexicographically smallest label), else keeps its current (possibly
    NULL) label. Fixed round count + deterministic tie-break = exactly
    replayable in SQL (the oracle unrolls the rounds as plain CTEs).

    Inputs: nodes (id, seed) with seed NULL for unlabeled; edges
    (id_a, id_b), one row per undirected edge.

    Scale shape: per round, ONE edge-keyed join against the label frame
    + one (node, label) aggregate + one node-keyed window — all shuffles
    on uniform keys; label-frame lineage is cut per round with
    localCheckpoint (the CC/PageRank idiom in this module). Rounds are
    a constant, not data-dependent."""
    from pyspark.sql import Window as W

    sym = (
        edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(edges.select(F.col("id_b"), F.col("id_a")))
        .persist()
    )
    labels = nodes.select("id", F.col("seed").alias("label"), "seed")
    try:
        for _ in range(int(n_rounds)):
            nb = sym.join(
                labels.select(
                    F.col("id").alias("dst"), F.col("label").alias("nlabel")
                ),
                "dst",
            ).filter(F.col("nlabel").isNotNull())
            cnt = nb.groupBy("src", "nlabel").agg(
                F.count(F.lit(1)).alias("c")
            )
            w = W.partitionBy("src").orderBy(F.desc("c"), F.asc("nlabel"))
            best = (
                cnt.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select(F.col("src").alias("id"), F.col("nlabel").alias("maj"))
            )
            labels = (
                labels.join(best, "id", "left")
                .select(
                    "id",
                    F.coalesce("seed", "maj", "label").alias("label"),
                    "seed",
                )
                # eager: materialize each round so the final frame has no
                # lineage into sym (unpersisted below) or prior rounds
                .localCheckpoint(eager=True)
            )
        return labels.select("id", "label")
    finally:
        sym.unpersist()


def kcore_peel(
    edges: DataFrame, k: int = 3, n_rounds: int = 3
) -> DataFrame:
    """Fixed-round k-core peeling (Seidman 1983; the iterative-peel
    formulation every distributed graph library uses): repeatedly
    remove nodes of degree < k, `n_rounds` synchronous rounds. Returns
    (id, peel_round, deg_final): peel_round = the round the node was
    removed (1-based), NULL for survivors; deg_final = remaining
    degree for survivors, NULL for peeled nodes. Survivors after
    enough rounds are exactly the k-core; a FIXED round count keeps
    the op deterministic and SQL-replayable (the LPA contract — full
    convergence on chain graphs needs O(n) rounds; dup-family graphs
    are near-cliques and settle in 2-3).

    Scale shape: per round, one degree aggregate + two semi-join edge
    filters, all keyed on node id; the edge frame is checkpointed per
    round so lineage stays bounded."""
    if int(n_rounds) < 1:
        raise ValueError(f"n_rounds must be >= 1, got {n_rounds}")
    canon = (
        edges.select(
            F.least("id_a", "id_b").alias("u"), F.greatest("id_a", "id_b").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    peeled = None  # (id, peel_round)
    alive = canon
    for rnd in range(1, int(n_rounds) + 1):
        deg = (
            alive.select(F.col("u").alias("id"))
            .union(alive.select(F.col("v")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        )
        doomed = deg.filter(F.col("deg") < k).select(
            "id", F.lit(rnd).alias("peel_round")
        )
        # bounded_checkpoint: the union/anti-join chains otherwise grow
        # the stored partition count by a shuffle width per round
        peeled = bounded_checkpoint(
            doomed if peeled is None else peeled.unionByName(doomed)
        )
        alive = bounded_checkpoint(
            alive.join(
                peeled.select(F.col("id").alias("u")), "u", "left_anti"
            )
            .join(peeled.select(F.col("id").alias("v")), "v", "left_anti")
            .select("u", "v")
        )
    survivors = (
        alive.select(F.col("u").alias("id"))
        .union(alive.select(F.col("v")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("deg_final"))
    )
    return survivors.select(
        "id", F.lit(None).cast("int").alias("peel_round"), "deg_final"
    ).unionByName(
        peeled.select(
            "id",
            F.col("peel_round").cast("int"),
            F.lit(None).cast("long").alias("deg_final"),
        )
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 4,
) -> DataFrame:
    """Multi-source level-bounded BFS over an undirected pair graph:
    (id, hops) = minimum hop count from the seed set for every node
    within `max_hops`, seeds at 0. The shortest-path primitive next to
    connected_components/pagerank/triangles in this module.

    Scale shape: each level is one frontier equi-join against the edge
    table plus an anti-join against the found set. The found set is
    bounded_checkpoint'ed per level (r14, the kcore-peel idiom): a lazy
    `max_hops`-deep chain re-computes every lower level inside each
    higher one and union-accumulates a shuffle width of near-empty
    partitions per level, so both plan size and task count grow per
    hop. One eager checkpoint per level keeps each frontier computed
    exactly once and the stored partition count capped at the cluster's
    parallelism; the frontier is then re-derived from the checkpointed
    found set (hops == k) at no extra job. Per-level cost is
    O(frontier x avg-degree). BFS discovers each node first at its true
    minimum level, so the anti-join (not a min-aggregate) is
    sufficient.

    `edges`: (id_a, id_b) undirected pairs; `seeds`: (id), deduplicated
    here — duplicate seed ids yield ONE hops-0 row, the same contract
    as bfs_hops_quotient's .distinct() on seeds (ADVICE r10: the two
    plans must stay output-identical on any input, including dup
    seeds)."""
    both = edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    dist = seeds.select("id").distinct().select(
        "id", F.lit(0).cast("long").alias("hops")
    )
    frontier = dist.select("id")
    for k in range(1, max_hops + 1):
        nxt = (
            frontier.join(both, frontier.id == both.src)
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(dist.select("id"), "id", "left_anti")
        )
        dist = bounded_checkpoint(
            dist.unionByName(
                nxt.select("id", F.lit(k).cast("long").alias("hops"))
            )
        )
        # frontier == the nodes first discovered this level, re-read
        # from the checkpointed found set instead of the nxt subtree
        frontier = dist.filter(F.col("hops") == k).select("id")
    return dist


def common_neighbor_counts(
    edges: DataFrame,
    center_cap: int | str | None = None,
    auto_wedge_budget: float = AUTO_WEDGE_BUDGET,
    salt: str = "lp",
) -> DataFrame:
    """Pair-level common-neighbor counts over an undirected pair graph:
    (id_a < id_b, cn) for EVERY pair — adjacent or not — sharing >= 1
    neighbor. This is the Σdeg² wedge stage that BOTH link prediction
    and triangle counting reduce to (VERDICT r8 #2):

    - restricted to NON-adjacent pairs it is link prediction's
      candidate frame (common-neighbor scores);
    - restricted to ADJACENT pairs, cn(u, v) is the number of triangles
      through edge (u, v), so per-node triangle participation is
      triangles(a) = ½ · Σ over incident edges (a, x) of cn(a, x)
      (each triangle {a, b, c} credits a once via (a,b) and once via
      (a,c)) — see triangle_counts_from_cn.

    Materializing this table once therefore serves the whole family —
    the same materialize-once contract as the similarity graph itself,
    one stage up.

    Scale shape: wedges generate at their CENTER via one self-equi-join
    of the directed edge list — Σdeg² work. `center_cap` gates that
    volume exactly as in link_prediction ("auto" probes sum(deg²) with
    one node-sized aggregate; above `auto_wedge_budget` each center's
    adjacency list is capped at max(2, floor(sqrt(budget / n_nodes)))
    by a deterministic stable hash and the switch logged; capped counts
    are honest lower bounds). Callers sharing the table across
    consumers should only do so in EXACT mode (cap None / auto-exact):
    capped cn undercounts triangles too.

    `edges`: (id_a, id_b) canonical pairs, id_a < id_b."""
    both = edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    wedge_src = both
    if center_cap == "auto":
        _, sdeg2, n_nodes = wedge_probe(edges)
        if sdeg2 > auto_wedge_budget and n_nodes > 0:
            center_cap = max(2, int((auto_wedge_budget / n_nodes) ** 0.5))
            import logging

            logging.getLogger(__name__).warning(
                "common_neighbor_counts auto-dispatch: wedge bound "
                "sum(deg^2)=%.3g exceeds budget %.3g — capping centers "
                "at %d neighbors (cn becomes a lower bound at hubs)",
                float(sdeg2),
                float(auto_wedge_budget),
                center_cap,
            )
        else:
            center_cap = None
    if center_cap is not None:
        if not isinstance(center_cap, int) or center_cap < 1:
            raise ValueError(
                f"center_cap must be 'auto', None, or a positive int, "
                f"got {center_cap!r}"
            )
        pick = Window.partitionBy("src").orderBy(
            F.xxhash64(
                F.concat_ws(":", F.lit(salt), F.col("src"), F.col("dst"))
            ),
            F.col("dst"),
        )
        wedge_src = (
            both.withColumn("_rn", F.row_number().over(pick))
            .filter(F.col("_rn") <= center_cap)
            .drop("_rn")
        )
    a, b = wedge_src.alias("a"), wedge_src.alias("b")
    return (
        a.join(
            b,
            (F.col("a.src") == F.col("b.src"))
            & (F.col("a.dst") < F.col("b.dst")),
        )
        .groupBy(
            F.col("a.dst").alias("id_a"), F.col("b.dst").alias("id_b")
        )
        .agg(F.count("*").cast("long").alias("cn"))
    )


def triangle_counts_from_cn(
    cn_pairs: DataFrame,
    edges: DataFrame,
    with_degrees: bool = False,
) -> DataFrame:
    """Per-node triangle participation derived from an EXACT pair-level
    common-neighbor table (common_neighbor_counts, uncapped): for each
    canonical edge (u, v), cn(u, v) is the number of triangles through
    that edge, so triangles(a) = ½ · Σ over a's incident edges of cn —
    triangle {a, b, c} credits a via both (a,b) and (a,c), hence the
    exact halving. Byte-identical to triangle_counts(sample_p=None) by
    construction (same triangle set, re-aggregated), letting a caller
    that already materialized the cn table for link prediction skip the
    compact-forward wedge join entirely (VERDICT r8 #2: the shared
    wedge stage).

    Shape: one pair-table equi-join against canonical edges + one
    explode + node-sized groupBy; with_degrees adds the node-sized
    degree aggregate, zero-filled exactly like triangle_counts."""
    canon = edges.select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
    ).filter(F.col("id_a") != F.col("id_b")).distinct()
    per_edge = canon.join(cn_pairs, ["id_a", "id_b"])
    halves = per_edge.select(
        F.explode(F.array("id_a", "id_b")).alias("id"), "cn"
    )
    out = (
        halves.groupBy("id")
        .agg((F.sum("cn") / F.lit(2)).cast("long").alias("triangles"))
        .filter(F.col("triangles") > 0)
    )
    if with_degrees:
        deg = (
            canon.select(F.col("id_a").alias("id"))
            .union(canon.select(F.col("id_b")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        out = deg.join(out, "id", "left").select(
            "id",
            F.coalesce(F.col("triangles"), F.lit(0).cast("long")).alias(
                "triangles"
            ),
            F.col("deg").cast("long").alias("deg"),
        )
    return out.localCheckpoint(eager=True)


def link_prediction(
    edges: DataFrame,
    top_k: int = 50,
    center_cap: int | str | None = "auto",
    auto_wedge_budget: float = AUTO_WEDGE_BUDGET,
    salt: str = "lp",
    cn_pairs: DataFrame | None = None,
) -> DataFrame:
    """Common-neighbor link prediction over an undirected pair graph:
    for every NON-adjacent pair sharing >= 1 neighbor, the
    common-neighbor count and the neighborhood Jaccard
    cn / (deg_a + deg_b - cn) (Liben-Nowell & Kleinberg CIKM'03), top
    `top_k` by (jaccard, cn, ids). In a dedup/curation pipeline this is
    the "missed near-duplicate" prober: pairs the banded candidate
    generation never compared but whose neighborhoods say it should
    have.

    Scale shape: wedges are generated at their CENTER via one
    self-equi-join of the directed edge list — Σdeg² work, the same
    volume the triangle family's auto-dispatch probes. `center_cap`
    gates that volume (the triangle_counts "auto" idiom):

    - `"auto"` (default): one node-sized degree aggregate measures the
      wedge bound sum(deg^2); at or below `auto_wedge_budget` the plan
      is EXACT and byte-identical to `center_cap=None`, above it each
      center's adjacency list is capped at
      max(2, floor(sqrt(budget / n_nodes))) neighbors so the capped
      wedge volume sum(min(deg, cap)^2) <= n*cap^2 lands back on
      budget, and the switch is logged. On a hub-heavy similarity
      graph (replica near-cliques) the uncapped wedge set is
      Theta(sum deg^2) and spills unboundedly; the probe costs one
      cheap pass over the node-sized degree frame.
    - `int`: cap unconditionally at that many neighbors per center.
    - `None`: always exact (legacy; only for graphs known sparse).

    Capped neighbor choice is a deterministic, partition-independent
    stable hash (xxhash64 over salt:src:dst, dst tie-break) — same
    result on any cluster layout. Degrees in the Jaccard denominator
    are always FULL-graph degrees (never capped), so capped-mode
    scores are honest lower bounds: cn can only be undercounted at hub
    centers, never inflated (mirrors triangle_counts' emit_deg rule).

    Candidate pairs are grouped map-side-combinable; the adjacency
    filter is a left-anti equi-join on the canonical (a<b) pair key;
    degrees attach via two vocabulary-of-nodes-sized joins. Jaccard is
    integer-ratio exact pre-round; ranking is TakeOrderedAndProject.

    `cn_pairs`: a precomputed EXACT pair-level common-neighbor table
    (common_neighbor_counts output, uncapped) — when provided, the
    wedge stage is skipped entirely and this call is just the
    anti-join + degree attach + top-k over it (the shared-wedge-memo
    consumer shape, VERDICT r8 #2); center_cap is ignored since the
    caller owns the table's exactness.

    `edges`: (id_a, id_b) canonical pairs, id_a < id_b."""
    deg = (
        edges.select(F.col("id_a").alias("id"))
        .unionByName(edges.select(F.col("id_b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("deg"))
        # node-sized pin: the two denominator joins below read it twice
        .localCheckpoint(eager=True)
    )
    cn = (
        cn_pairs
        if cn_pairs is not None
        else common_neighbor_counts(
            edges,
            center_cap=center_cap,
            auto_wedge_budget=auto_wedge_budget,
            salt=salt,
        )
    )
    ne = cn.join(edges, ["id_a", "id_b"], "left_anti")
    da = deg.select(F.col("id").alias("id_a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("id_b"), F.col("deg").alias("deg_b"))
    return (
        ne.join(da, "id_a")
        .join(db, "id_b")
        .select(
            "id_a",
            "id_b",
            "cn",
            "deg_a",
            "deg_b",
            F.round(
                F.col("cn").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("cn")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
        .orderBy(
            F.col("jaccard").desc(),
            F.col("cn").desc(),
            F.col("id_a").asc(),
            F.col("id_b").asc(),
        )
        .limit(top_k)
    )


def _quotient_cls(classes: DataFrame, prepared: bool = False) -> DataFrame:
    """Filter + project + pin the exact-collapse class table for the
    quotient ops: has_sig classes only, exactly (rep, members, m:long),
    eagerly localCheckpoint-ed. NOT persist(): checkpoint blocks are
    released by the ContextCleaner when the frame goes out of scope, so
    bench min-of-N reps don't accumulate cached class tables for the
    session lifetime (the pagerank()/ADVICE-r7 leak class).

    `prepared=True` is the EXPLICIT caller assertion that `classes` is
    this function's own output (a caller that prepares ONCE —
    catalog._quotient_graph — shares a single checkpoint across every
    quotient consumer instead of each op eagerly re-materializing its
    own copy per invocation, ADVICE r10). The shape is still verified
    and a mismatch raises — but the old structural duck-typing is gone:
    a 3-column class table that merely LOOKS prepared (never
    has_sig-filtered, never pinned) no longer silently skips the
    isolation filter, which would have treated isolated no-signature
    classes as internal cliques (ADVICE r11)."""
    if prepared:
        if classes.columns != ["rep", "members", "m"] or dict(
            classes.dtypes
        ).get("m") != "bigint":
            raise ValueError(
                "prepared=True asserts _quotient_cls-shaped input "
                "(rep, members, m:bigint), got "
                f"{classes.dtypes!r}"
            )
        return classes
    return (
        classes.filter(F.col("has_sig"))
        .select("rep", "members", F.col("m").cast("long").alias("m"))
        .localCheckpoint(eager=True)
    )


def _pin_qedges(qedges: DataFrame, canonical: bool) -> DataFrame:
    """Canonicalize + pin the quotient adjacency — or trust the caller.

    canonical=True asserts the input is already (id_a < id_b), distinct,
    and PINNED (persisted/checkpointed) — the catalog's _quotient_graph
    shape — and returns it untouched. The default (False) keeps the
    defensive canonicalize-and-checkpoint for standalone callers.

    Why the flag exists (mixed-100x finding): on a paraphrase-dense
    corpus the quotient adjacency is itself ~1e8 rows; the defensive
    re-distinct + eager localCheckpoint per op re-materialized it as
    DESERIALIZED in-memory values (MemoryStore.putIteratorAsValues) and
    OOM'd the JVM — the caller's one serialized-columnar persist must
    be the only pin."""
    if canonical:
        return qedges
    # serialized blocks (MEMORY_AND_DISK; the deserialized default is
    # the OOM class above), still ContextCleaner-released on GC
    return (
        qedges.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .distinct()
        .localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )


def wedge_cap_for_exact_fraction(
    edges: DataFrame, exact_frac: float = 0.99
) -> int | None:
    """Center cap chosen by TARGET RECALL instead of compute budget
    (VERDICT r11 #4): the degree `exact_frac`-quantile of the graph.
    Every node with degree <= cap keeps EXACT wedge terms (the cap
    never binds there), so `exact_frac` is a direct accuracy contract
    — "99% of nodes exact, hubs bounded" — where the budget cap's
    guarantee is only "compute bounded". Measured on the x30 mixed
    quotient (8,015 nodes, max deg 1,042): budget cap 44 keeps the
    TOTAL triangle count at 0.096 of exact (mean per-node ratio 0.52)
    while link-pred top-50 overlap stays 49/50 — triangle TOTALS are
    the cap-sensitive consumer, so a pipeline reporting counts should
    pick its cap here and pay the implied wedge volume, or report the
    budget-capped number as the quantified lower bound the log line
    states. Returns None on an empty graph."""
    if not 0.0 < exact_frac <= 1.0:
        raise ValueError(f"exact_frac must be in (0, 1], got {exact_frac}")
    deg, _sdeg2, n_nodes = wedge_probe(edges)
    if n_nodes == 0:
        return None
    q = deg.approxQuantile("deg", [exact_frac], 0.001)
    return max(2, int(q[0]))


def _quotient_wedge_cap(
    qedges: DataFrame, auto_wedge_budget: float, op_name: str
) -> int | None:
    """Σdeg² probe on the QUOTIENT adjacency → None (exact) or a center
    cap (logged) — the member-level center_cap="auto" idiom applied to
    the quotient wedge stage. The replica tiers justified "the quotient
    is small" (collapse shrinks replica cliques to single nodes), but a
    MIXED corpus with paraphrase-level near-dups has a dense quotient —
    the mixed-100x fixture's is ~1e8 edges with Σdeg² ~1e11 — so the
    quotient wedge joins need the same budget gate as their member
    siblings. Capped mode keeps every edge-linear term exact and makes
    only the wedge-derived term an honest lower bound at hubs (the
    common_neighbor_counts contract)."""
    deg, sdeg2, n_nodes = wedge_probe(qedges)
    if sdeg2 > auto_wedge_budget and n_nodes > 0:
        import logging

        cap = max(2, int((auto_wedge_budget / n_nodes) ** 0.5))
        # r13 (VERDICT r12 "what's wrong" #1): before settling for the
        # budget cap, try the ACCURACY-CONTRACT cap — the 0.99 degree
        # quantile (wedge_cap_for_exact_fraction's rule, "99% of nodes
        # keep EXACT wedge terms"). Degree skew means the Σdeg² blowup
        # is usually a few hubs, so the quantile cap's actual wedge
        # volume Σ min(deg, q99)² is affordable surprisingly often;
        # when it fits 4x the budget, take it — the x30 measurement
        # showed budget cap 44 leaves triangle TOTALS at 0.096 of
        # exact while the quantile cap reads 0.423 at 2.75x the wall.
        q = deg.approxQuantile("deg", [0.99], 0.001)
        qcap = max(2, int(q[0])) if q else cap
        if qcap > cap:
            capped = F.least(F.col("deg"), F.lit(qcap)).cast("long")
            vol = deg.agg(F.sum(capped * capped)).first()[0] or 0
            if float(vol) <= 4.0 * float(auto_wedge_budget):
                logging.getLogger(__name__).warning(
                    "%s auto-dispatch: escalating budget cap %d to the "
                    "accuracy-contract cap %d (0.99 degree quantile) — "
                    "its wedge volume %.3g fits 4x the %.3g budget, so "
                    "99%% of nodes keep EXACT wedge terms by "
                    "construction",
                    op_name, cap, qcap, float(vol),
                    float(auto_wedge_budget),
                )
                cap = qcap
        # quantify the bound (VERDICT r11 #4): nodes at degree <= cap
        # keep EXACT wedge terms; only the logged hub fraction is
        # lower-bounded. One extra count over the probe's degree frame.
        n_exact = deg.filter(F.col("deg") <= cap).count()
        logging.getLogger(__name__).warning(
            "%s auto-dispatch: quotient wedge bound sum(deg^2)=%.3g "
            "exceeds budget %.3g — capping centers at %d neighbors; "
            "%.1f%% of nodes (deg <= cap) stay EXACT, wedge-derived "
            "scores are lower bounds at the remaining hubs (pick the "
            "cap via wedge_cap_for_exact_fraction for a target recall "
            "instead of a compute budget)",
            op_name,
            float(sdeg2),
            float(auto_wedge_budget),
            cap,
            100.0 * n_exact / n_nodes,
        )
        return cap
    return None


def _cap_by_center(
    df: DataFrame, center: str, other: str, cap: int, salt: str
) -> DataFrame:
    """Deterministic per-center adjacency cap: keep `cap` rows per
    `center`, chosen by a partition-independent stable hash with
    `other` as tie-break — the same pick rule as
    common_neighbor_counts' capped mode, so capped quotient and capped
    member plans degrade identically."""
    pick = Window.partitionBy(center).orderBy(
        F.xxhash64(F.concat_ws(":", F.lit(salt), F.col(center), F.col(other))),
        F.col(other),
    )
    return (
        df.withColumn("_rn", F.row_number().over(pick))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def bfs_hops_quotient(
    qedges: DataFrame,
    classes: DataFrame,
    seeds: DataFrame,
    max_hops: int = 4,
    prepared: bool = False,
) -> DataFrame:
    """Multi-source BFS of a member-expanded similarity graph, levelled
    on the quotient. A member path s→…→y induces a class walk of the
    same length, and from ANY member of class A every member of an
    adjacent class B is one hop — so member distance equals quotient
    distance, with exactly one special case: a NON-seed member of a
    seed class is at hop 1 via the class's internal clique (never
    shorter through any detour). Rules, exact by the above:

      seed ids                               -> 0  (graph presence not
                                                   required — matches
                                                   bfs_hops' seed rule)
      non-seed y in C, C not a seed class    -> quotient dist(C)
      non-seed y in a seed class with >= 1   -> 1
        token (internal clique exists)
      members of no-signature classes        -> unreachable (isolated)

    The quotient BFS is `bfs_hops` itself over the class graph — the
    member-level edge table (2.4B rows at the 100x tier, where the
    direct plan died materializing it) never exists. Inputs as in
    `link_prediction_quotient`; `seeds` = (id) member-level. Output
    (id, hops), identical to `bfs_hops`. `prepared=True` asserts
    catalog-prepared classes (see _quotient_cls)."""
    cls = _quotient_cls(classes, prepared)
    seeds = seeds.select("id").distinct().localCheckpoint(eager=True)
    membership = cls.select(
        "rep", F.explode("members").alias("id")
    )
    seed_cls = (
        membership.join(seeds, "id", "left_semi").select("rep").distinct()
    )
    qdist = bfs_hops(
        qedges.select("id_a", "id_b"),
        seed_cls.select(F.col("rep").alias("id")),
        max_hops=max_hops,
    ).select(F.col("id").alias("rep"), F.col("hops").alias("qhops"))
    non_seed = membership.join(seeds, "id", "left_anti")
    is_seed_cls = seed_cls.select("rep", F.lit(True).alias("is_seed_cls"))
    expanded = (
        non_seed.join(qdist, "rep", "left")
        .join(F.broadcast(is_seed_cls), "rep", "left")
        .select(
            "id",
            F.when(F.col("is_seed_cls"), F.lit(1).cast("long"))
            .otherwise(F.col("qhops"))
            .alias("hops"),
        )
        .filter(F.col("hops").isNotNull() & (F.col("hops") <= max_hops))
    )
    return seeds.select("id", F.lit(0).cast("long").alias("hops")).unionByName(
        expanded
    )


def pagerank_quotient(
    qedges: DataFrame,
    classes: DataFrame,
    damping: float = 0.85,
    n_iter: int = 5,
    round_digits: int = 12,
    canonical: bool = False,
    prepared: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank of a member-expanded similarity graph,
    iterated on its weighted quotient — members of an exact-duplicate
    class are automorphic, so they share one rank value r_A and the
    member-level recursion collapses to the class fixed-point

      r_A' = round(base + d·[ Σ_{C adj A} m_C·(r_C/deg_C)
                              + (m_A-1)·(r_A/deg_A) ], round_digits)

    with deg_A = Σ_{C adj A} m_C + (m_A-1), base = (1-d)/n, n = total
    MEMBER count over participating (deg >= 1) classes. The determinism
    contract is `pagerank`'s own: ranks round to `round_digits` after
    EVERY iteration, which absorbs float summation-order noise — the
    quotient's m_C·t versus the member plan's m_C-fold addition of t
    differs at the same ~1e-16 relative scale that contract already
    absorbs between Spark and the DuckDB oracle recursion. Tolerated
    risk bound, NOT a proof (ADVICE r10): the absorption is
    probabilistic — an iterate landing within ~1e-16·|r| of a .5e-12
    rounding boundary can round differently from the member-level
    recursion, after which the two stay exactly one ulp of the rounded
    grid (1e-12) apart. Any such mismatch is confined to the last
    rounded digit of isolated rows; none has been observed across the
    sf0.001/sf0.01 oracle fixtures or the 10x/100x replica tiers (the
    12-digit member-parity pytest). A consumer needing unconditional
    oracle equality should compare at round-6 or with 1-ulp tolerance.

    Per iteration: one quotient-edge join + one class-sized aggregate,
    instead of a member-edge scan (2.4B rows at the 100x tier).
    Output (id, rank) at member granularity, schema identical to
    `pagerank` consumers' expectations. Inputs as in
    `link_prediction_quotient`; `prepared=True` asserts
    catalog-prepared classes (see _quotient_cls)."""
    cls = _quotient_cls(classes, prepared)
    # canonical=False canonicalizes defensively — duplicate/reversed
    # rows would double edge weight in the degree and contribution sums
    qedges = _pin_qedges(qedges, canonical)
    w = cls.select(F.col("rep").alias("c"), F.col("m").alias("w"))
    und = (
        qedges.select(F.col("id_a").alias("a"), F.col("id_b").alias("c"))
        .unionByName(
            qedges.select(F.col("id_b").alias("a"), F.col("id_a").alias("c"))
        )
        .persist()
    )
    cross_w = (
        und.join(F.broadcast(w), "c").groupBy("a").agg(F.sum("w").alias("cw"))
    )
    part = (
        cls.select(F.col("rep").alias("a"), "m")
        .join(cross_w, "a", "left")
        .select(
            F.col("a").alias("rep"),
            "m",
            (F.coalesce(F.col("cw"), F.lit(0)) + F.col("m") - 1)
            .cast("long")
            .alias("degw"),
        )
        .filter(F.col("degw") >= 1)
        .localCheckpoint(eager=True)
    )
    row = part.agg(F.sum("m")).first()
    n = int(row[0] or 0)
    if n == 0:
        return cls.sparkSession.createDataFrame([], "id long, rank double")
    base = float(1.0 - damping) / n
    ranks = part.select(
        "rep", F.round(F.lit(1.0 / n), round_digits).alias("rank")
    )
    pinfo = part.select(
        F.col("rep").alias("c"), F.col("m").alias("mc"), F.col("degw").alias("degc")
    )
    for _ in range(n_iter):
        term = (
            und.join(ranks.withColumnRenamed("rep", "c"), "c")
            .join(F.broadcast(pinfo), "c")
            .select(
                F.col("a").alias("rep"),
                (F.col("mc") * (F.col("rank") / F.col("degc"))).alias("t"),
            )
        )
        self_term = (
            part.join(ranks, "rep")
            .select(
                "rep",
                ((F.col("m") - 1) * (F.col("rank") / F.col("degw"))).alias("t"),
            )
        )
        ranks = (
            term.unionByName(self_term)
            .groupBy("rep")
            .agg(
                F.round(
                    F.lit(base) + F.lit(damping) * F.sum("t"), round_digits
                ).alias("rank")
            )
            .localCheckpoint(eager=True)
        )
    und.unpersist()
    return ranks.join(F.broadcast(cls.select("rep", "members")), "rep").select(
        F.explode("members").alias("id"), "rank"
    )


def triangle_counts_quotient(
    qedges: DataFrame,
    classes: DataFrame,
    with_degrees: bool = False,
    canonical: bool = False,
    auto_wedge_budget: float | None = AUTO_WEDGE_BUDGET,
    prepared: bool = False,
    wedge_cap: int | None | str = "probe",
    with_exact_flag: bool = False,
) -> DataFrame:
    """EXACT per-node triangle participation over a member-expanded
    similarity graph, computed on its weighted quotient (see
    `link_prediction_quotient` for the expansion model: adjacent
    classes form complete bicliques, a signature class is an internal
    clique). For x in class A with cross-neighbor weight
    S_A = Σ_{C adj A} m_C:

      triangles(x) = C(m_A-1, 2)                  [both others inside A]
                   + (m_A-1) · S_A                [one inside A, one adjacent]
                   + Σ_{C adj A} C(m_C, 2)        [both inside one adjacent C]
                   + Σ_{C<D adj A, C adj D} m_C·m_D   [two adjacent classes,
                                                        quotient triangle]

    and deg(x) = S_A + (m_A - 1). Integer arithmetic throughout —
    byte-identical to `triangle_counts(sample_p=None)` on the expanded
    graph at ANY replica multiplicity, while the wedge stage runs at
    unique-corpus scale (the 100x member graph's 2.4B edges never
    materialize). `with_degrees=True` returns the zero-filled
    (id, triangles, deg) superset over all nodes with deg >= 1, exactly
    like triangle_counts; False filters triangles > 0.

    The wedge stage is Σdeg²-gated on the QUOTIENT (`auto_wedge_budget`;
    None forces exact): a paraphrase-dense corpus has a dense quotient
    (mixed-100x: ~1e8 qedges, Σdeg² ~1e11), so over budget each
    center's adjacency caps (deterministic hash, logged) and the
    quotient-triangle term t_w becomes an honest lower bound at hubs —
    the edge-linear terms stay exact. `canonical=True` asserts
    pre-canonicalized, pinned qedges (see _pin_qedges); `prepared=True`
    asserts catalog-prepared classes (_quotient_cls); `wedge_cap`
    accepts a PRE-PROBED verdict (int cap or None=exact) from a caller
    that memoized the Σdeg² probe alongside the qedges pin
    (catalog._quotient_graph) so repeat invocations skip the eager
    wedge_probe aggregate (ADVICE r11) — the default "probe" keeps the
    standalone per-call probe.

    `with_exact_flag=True` (r13, VERDICT r12 "what's wrong" #1) appends
    a `wedge_exact` boolean PER NODE: True iff the node's class had
    quotient adjacency ≤ the applied cap (or no cap applied), i.e. its
    triangle count is EXACT, not a lower bound. The quantification
    previously lived only in a log line; a pipeline reading capped
    counts can now carry it in the result itself. The capped probe
    also escalates to the 0.99-quantile accuracy-contract cap whenever
    that cap's wedge volume fits 4x the budget (see
    _quotient_wedge_cap) — count-shaped consumers default to the
    accuracy contract when it is affordable.

    Inputs as in `link_prediction_quotient`."""
    cls = _quotient_cls(classes, prepared)
    # canonical=False canonicalizes defensively (least/greatest +
    # distinct): the wedge (c1<c2) semi-join and the expansion
    # identities assume canonical pairs — a symmetrized/reversed input
    # would silently undercount
    qedges = _pin_qedges(qedges, canonical)
    w = cls.select(F.col("rep").alias("c"), F.col("m").alias("w"))
    und = qedges.select(
        F.col("id_a").alias("a"), F.col("id_b").alias("c")
    ).unionByName(qedges.select(F.col("id_b").alias("a"), F.col("id_a").alias("c")))
    undw = und.join(F.broadcast(w), "c")
    # S_A and the inside-one-adjacent-class term in ONE pass. C(w,2) via
    # shiftright — pure long arithmetic (w*(w-1) is always even), so the
    # "exact at ANY replica multiplicity" guarantee holds past 2^53,
    # where a double-division intermediate would silently round
    # (ADVICE r10).
    agg1 = undw.groupBy("a").agg(
        F.sum("w").alias("s_w"),
        F.sum(F.shiftright(F.col("w") * (F.col("w") - 1), 1)).alias("ic_w"),
        # unweighted quotient adjacency — the per-class exactness
        # criterion for with_exact_flag (rides the same aggregate)
        F.count(F.lit(1)).cast("long").alias("qdeg"),
    )
    # quotient triangles through center A, weighted m_C*m_D: wedge pairs
    # at the center, semi-verified against the quotient edge set. The
    # wedge stage alone is Σdeg²-gated (auto_wedge_budget=None forces
    # exact): over budget, each center's adjacency list caps and ONLY
    # t_w undercounts at hubs — every edge-linear term (s_w, ic_w, deg,
    # the within-class C(m-1,2)) stays exact.
    wedge_src = undw
    applied_cap = None
    if auto_wedge_budget is not None:
        applied_cap = (
            _quotient_wedge_cap(
                qedges, auto_wedge_budget, "triangle_counts_quotient"
            )
            if wedge_cap == "probe"
            else wedge_cap
        )
        if applied_cap is not None:
            wedge_src = _cap_by_center(undw, "a", "c", applied_cap, "tq")
    x = wedge_src.select("a", F.col("c").alias("c1"), F.col("w").alias("w1"))
    y = wedge_src.select("a", F.col("c").alias("c2"), F.col("w").alias("w2"))
    tA = (
        x.join(y, "a")
        .filter(F.col("c1") < F.col("c2"))
        .join(
            qedges.select(
                F.col("id_a").alias("c1"), F.col("id_b").alias("c2")
            ),
            ["c1", "c2"],
            "left_semi",
        )
        .groupBy("a")
        .agg(F.sum(F.col("w1") * F.col("w2")).cast("long").alias("t_w"))
    )
    base = (
        cls.select(F.col("rep").alias("a"), "members", "m")
        .join(agg1, "a", "left")
        .join(tA, "a", "left")
        .select(
            "members",
            "m",
            F.coalesce(F.col("s_w"), F.lit(0)).cast("long").alias("s_w"),
            F.coalesce(F.col("ic_w"), F.lit(0)).cast("long").alias("ic_w"),
            F.coalesce(F.col("t_w"), F.lit(0)).cast("long").alias("t_w"),
            F.coalesce(F.col("qdeg"), F.lit(0)).cast("long").alias("qdeg"),
        )
    )
    mm = F.col("m") - 1
    tri = (
        F.shiftright(mm * (mm - 1), 1)  # long C(m-1,2), no double round
        + mm * F.col("s_w")
        + F.col("ic_w")
        + F.col("t_w")
    ).cast("long")
    deg = (F.col("s_w") + mm).cast("long")
    exact_col = (
        F.lit(True)
        if applied_cap is None
        else (F.col("qdeg") <= F.lit(int(applied_cap)))
    )
    cols = [
        F.explode("members").alias("id"),
        tri.alias("triangles"),
        deg.alias("deg"),
    ]
    if with_exact_flag:
        cols.append(exact_col.alias("wedge_exact"))
    out = base.select(*cols)
    if with_degrees:
        return out.filter(F.col("deg") >= 1).localCheckpoint(eager=True)
    keep = ["id", "triangles"] + (["wedge_exact"] if with_exact_flag else [])
    return out.filter(F.col("triangles") > 0).select(*keep)


def kcore_peel_quotient(
    qedges: DataFrame,
    classes: DataFrame,
    k: int = 3,
    n_rounds: int = 3,
    canonical: bool = False,
    prepared: bool = False,
) -> DataFrame:
    """Fixed-round k-core peeling on the weighted quotient — members of
    an exact-duplicate class share their degree, so they peel in the
    same round: the synchronous member-level rounds of `kcore_peel`
    replay exactly at class granularity with
    deg(x in A) = Σ_{C alive, C adj A} m_C + (m_A - 1). A class with no
    alive incident member edge (m = 1 and no alive cross edges) has no
    degree row and vanishes without being peeled — the same silent-drop
    rule as the member-level op. Output (id, peel_round, deg_final),
    schema identical to `kcore_peel`, exact at any multiplicity; each
    round is one quotient-sized aggregate instead of a member-edge
    scan (2.4B rows at the 100x tier). `prepared=True` asserts
    catalog-prepared classes (see _quotient_cls)."""
    if int(n_rounds) < 1:
        raise ValueError(f"n_rounds must be >= 1, got {n_rounds}")
    cls = _quotient_cls(classes, prepared)
    canon = _pin_qedges(qedges, canonical).select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    )

    def _deg(alive_cls, alive_e):
        und = alive_e.select(
            F.col("u").alias("a"), F.col("v").alias("c")
        ).unionByName(alive_e.select(F.col("v").alias("a"), F.col("u").alias("c")))
        wts = alive_cls.select(F.col("rep").alias("c"), F.col("m").alias("w"))
        cross = (
            und.join(F.broadcast(wts), "c")
            .groupBy("a")
            .agg(F.sum("w").alias("cross_w"))
        )
        return (
            alive_cls.select(F.col("rep").alias("a"), "m")
            .join(cross, "a", "left")
            .select(
                F.col("a").alias("rep"),
                (F.coalesce(F.col("cross_w"), F.lit(0)) + F.col("m") - 1)
                .cast("long")
                .alias("deg"),
            )
            .filter(F.col("deg") >= 1)  # deg-0 classes vanish silently
        )

    peeled = None  # (rep, peel_round)
    alive_cls = cls.select("rep", "m")
    alive_e = canon
    for rnd in range(1, int(n_rounds) + 1):
        doomed = _deg(alive_cls, alive_e).filter(F.col("deg") < k).select(
            "rep", F.lit(rnd).alias("peel_round")
        )
        peeled = bounded_checkpoint(
            doomed if peeled is None else peeled.unionByName(doomed)
        )
        alive_cls = bounded_checkpoint(
            alive_cls.join(peeled, "rep", "left_anti")
        )
        # edge-sized per-round pin: SERIALIZED blocks — the default
        # deserialized checkpoint of a ~1e8-row alive edge set OOM'd
        # the heap on the mixed 100x tier (kcore was the one quotient
        # op still checkpointing edge-sized frames per round)
        alive_e = (
            alive_e.join(
                peeled.select(F.col("rep").alias("u")), "u", "left_anti"
            )
            .join(peeled.select(F.col("rep").alias("v")), "v", "left_anti")
            .select("u", "v")
            .localCheckpoint(
                eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
            )
        )
    survivors = _deg(alive_cls, alive_e).select(
        "rep",
        F.lit(None).cast("int").alias("peel_round"),
        F.col("deg").alias("deg_final"),
    )
    both = survivors.unionByName(
        peeled.select(
            "rep",
            F.col("peel_round").cast("int"),
            F.lit(None).cast("long").alias("deg_final"),
        )
    )
    return both.join(
        F.broadcast(cls.select("rep", "members")), "rep"
    ).select(
        F.explode("members").alias("id"), "peel_round", "deg_final"
    )


def link_prediction_quotient(
    qedges: DataFrame,
    classes: DataFrame,
    top_k: int = 50,
    canonical: bool = False,
    auto_wedge_budget: float | None = AUTO_WEDGE_BUDGET,
    prepared: bool = False,
    wedge_cap: int | None | str = "probe",
) -> DataFrame:
    """EXACT link prediction over a member-expanded similarity graph,
    computed on its WEIGHTED QUOTIENT — the exact-collapse answer to
    the one graph query the 10x replica tier could only answer capped
    (`link_prediction(center_cap="auto")` under-counts hub wedges by
    design when Σdeg² blows the budget).

    When the similarity graph's edges come from a signature pair
    family over documents (simhash here), adjacency is constant on
    exact-duplicate classes: members of adjacent classes form complete
    bicliques, a signature class with m >= 2 members is an internal
    clique, and a class with no signature is isolated. Every
    link-prediction quantity is therefore a function of the QUOTIENT
    graph (one node per class, weight m) alone:

      deg(x in A)  = Σ_{C adj A} m_C + (m_A - 1)
      cn(x∈A,y∈B)  = Σ_{C adj A and C adj B} m_C    (A ≠ B, A not adj B)

    Non-adjacent member pairs with a common neighbor are EXACTLY the
    cross-class pairs of non-adjacent signature classes (same-class
    pairs are either clique edges or isolated), so the top-k expands
    from class-level scores. On an N-doc corpus with U unique texts the
    wedge join runs at U-scale — Σdeg² of the quotient equals the
    UNIQUE corpus's Σdeg², i.e. replica multiplicity no longer inflates
    the budget — and the result is exact at any multiplicity, not a
    capped lower bound.

    Inputs: `qedges` (id_a, id_b) canonical rep-level adjacency;
    `classes` (rep, members, m, has_sig) — `exact_collapse_classes`
    output plus has_sig (class text yields >= 1 token, i.e. it has a
    simhash signature; no-signature classes are isolated and dropped).
    Output schema/ordering identical to `link_prediction`.

    EXACT holds when the QUOTIENT's Σdeg² is under `auto_wedge_budget`
    (always true on replica-dense corpora, where collapse shrinks dup
    cliques to single nodes). A paraphrase-dense corpus keeps a dense
    quotient (mixed-100x: Σdeg² ~1e11), so over budget the wedge stage
    caps per-center adjacency (deterministic hash, logged) and cn /
    jaccard become honest lower bounds at hubs — exactly the
    member-level `link_prediction(center_cap="auto")` degradation.
    None forces exact. `canonical=True` asserts pre-canonicalized,
    pinned qedges (_pin_qedges); `prepared=True` asserts
    catalog-prepared classes (_quotient_cls); `wedge_cap` accepts a
    PRE-PROBED verdict (int cap or None=exact) from a caller that
    memoized the Σdeg² probe alongside the qedges pin, skipping the
    per-invocation wedge_probe aggregate (ADVICE r11); default "probe"
    keeps the standalone probe."""
    cls = _quotient_cls(classes, prepared)
    # pin the quotient adjacency: it feeds the degree pass, BOTH wedge
    # sides, and the anti-join — unpinned, the upstream signature
    # pipeline (collapse groupBy + simhash) would re-execute per
    # reference (the same reason _sim_graph/similarity_graph checkpoint
    # the member-level pair table). canonical=False canonicalizes
    # defensively: the anti-join and (id_a<id_b) wedge pairs assume
    # canonical input; canonical=True trusts the caller's pin.
    qedges = _pin_qedges(qedges, canonical)
    w = cls.select(F.col("rep").alias("c"), F.col("m").alias("w"))
    und = qedges.select(
        F.col("id_a").alias("a"), F.col("id_b").alias("c")
    ).unionByName(qedges.select(F.col("id_b").alias("a"), F.col("id_a").alias("c")))
    # weights attach to the EDGE-sized side (broadcast: |classes| rows)
    # BEFORE the wedge join — joining them onto the Σdeg²-sized wedge
    # output would shuffle the whole wedge volume a second time
    undw = und.join(F.broadcast(w), "c")
    cross = undw.groupBy("a").agg(F.sum("w").alias("cross_w"))
    degw = (
        cls.select(F.col("rep").alias("a"), (F.col("m") - 1).alias("self_w"))
        .join(cross, "a", "left")
        .select(
            F.col("a").alias("nid"),
            (F.coalesce(F.col("cross_w"), F.lit(0)) + F.col("self_w"))
            .cast("long")
            .alias("degw"),
        )
    )
    # wedge stage keyed at the common-neighbor center c — Σdeg²-gated
    # on the quotient (auto_wedge_budget=None forces exact): over
    # budget each center's adjacency caps and cn/jaccard become honest
    # lower bounds at hubs (degw denominators stay FULL-graph exact,
    # the member-level capped-mode rule)
    wedge_und, wedge_undw = und, undw
    if auto_wedge_budget is not None:
        cap = (
            _quotient_wedge_cap(
                qedges, auto_wedge_budget, "link_prediction_quotient"
            )
            if wedge_cap == "probe"
            else wedge_cap
        )
        if cap is not None:
            wedge_und = _cap_by_center(und, "c", "a", cap, "lpq")
            wedge_undw = wedge_und.join(F.broadcast(w), "c")
    x = wedge_undw.select("c", F.col("a").alias("id_a"), "w")
    y = wedge_und.select("c", F.col("a").alias("id_b"))
    cnw = (
        x.join(y, "c")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum("w").cast("long").alias("cn"))
    )
    ne = cnw.join(qedges, ["id_a", "id_b"], "left_anti")
    scored = (
        ne.join(
            F.broadcast(
                degw.select(
                    F.col("nid").alias("id_a"), F.col("degw").alias("dwa")
                )
            ),
            "id_a",
        )
        .join(
            F.broadcast(
                degw.select(
                    F.col("nid").alias("id_b"), F.col("degw").alias("dwb")
                )
            ),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("cn").cast("double")
                / (F.col("dwa") + F.col("dwb") - F.col("cn")).cast("double"),
                6,
            ),
        )
        # referenced twice below (boundary probe + kept filter): pin so
        # the Σdeg² wedge aggregate runs once. SERIALIZED blocks: this
        # frame is candidate-pair-sized (bounded by the wedge budget,
        # still ~1e8-row territory on a dense quotient) — the
        # deserialized default is the mixed-100x OOM class
        .localCheckpoint(
            eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
        )
    )
    # expand ONLY the class pairs that can reach the member-level top-k:
    # every member row inherits its class pair's (jaccard, cn) key, and
    # the top-k class pairs each contribute >= 1 member row, so the kth
    # member row's key is >= the kth class pair's key K — hence any
    # class pair contributing a top-k member row has key >= K. Keeping
    # key >= K (the boundary, ties included) is a tight superset;
    # expanding everything first made the 100x tier explode
    # |ne| x m_a x m_b rows into TakeOrdered.
    head = (
        scored.orderBy(
            F.col("jaccard").desc(),
            F.col("cn").desc(),
            F.col("id_a").asc(),
            F.col("id_b").asc(),
        )
        .limit(top_k)
        .select("jaccard", "cn")
        .collect()
    )
    if not head:
        jb, cb = -1.0, -1
    else:
        jb, cb = head[-1]["jaccard"], head[-1]["cn"]
    kept = scored.filter(
        (F.col("jaccard") > F.lit(jb))
        | ((F.col("jaccard") == F.lit(jb)) & (F.col("cn") >= F.lit(cb)))
    )
    ma = cls.select(F.col("rep").alias("id_a"), F.col("members").alias("ma"))
    mb = cls.select(F.col("rep").alias("id_b"), F.col("members").alias("mb"))
    return (
        kept.join(F.broadcast(ma), "id_a")
        .join(F.broadcast(mb), "id_b")
        .select("cn", "dwa", "dwb", "jaccard", F.explode("ma").alias("xa"), "mb")
        .select("cn", "dwa", "dwb", "jaccard", "xa", F.explode("mb").alias("xb"))
        .select(
            F.least("xa", "xb").alias("id_a"),
            F.greatest("xa", "xb").alias("id_b"),
            "cn",
            F.when(F.col("xa") < F.col("xb"), F.col("dwa"))
            .otherwise(F.col("dwb"))
            .alias("deg_a"),
            F.when(F.col("xa") < F.col("xb"), F.col("dwb"))
            .otherwise(F.col("dwa"))
            .alias("deg_b"),
            "jaccard",
        )
        .orderBy(
            F.col("jaccard").desc(),
            F.col("cn").desc(),
            F.col("id_a").asc(),
            F.col("id_b").asc(),
        )
        .limit(top_k)
    )
