"""PageRank operator invariants (the catalog entry is oracle-checked;
these pin the operator's math on a known graph)."""

from pyspark.sql import functions as F


def test_pagerank_known_graph(spark):
    from ai_vector_database_converstion_from_pdf_spark.operators.graph import pagerank

    # undirected path graph 1-2-3: symmetric edge list
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "id_a long, id_b long"
    )
    out = {r["id"]: r["rank"] for r in pagerank(edges, n_iter=20).collect()}
    # center node dominates; ends are symmetric
    assert out[2] > out[1] == out[3]
    # mass conservation: every node has in-edges, so ranks sum to ~1
    assert abs(sum(out.values()) - 1.0) < 1e-6


def test_pagerank_deterministic_across_layouts(spark):
    from ai_vector_database_converstion_from_pdf_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i * 7) % 23) for i in range(23)] + [((i * 7) % 23, i) for i in range(23)],
        "id_a long, id_b long",
    ).filter(F.col("id_a") != F.col("id_b"))
    a = sorted(map(tuple, pagerank(edges, n_iter=5).collect()))
    b = sorted(map(tuple, pagerank(edges.repartition(11), n_iter=5).collect()))
    assert a == b


def test_pagerank_checkpoint_every_is_value_identical(spark):
    """checkpoint_every truncates lineage only — ranks must match the
    unchunked run bit-for-bit (values are rounded before materializing)."""
    from ai_vector_database_converstion_from_pdf_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i * 5) % 17) for i in range(17)] + [((i * 5) % 17, i) for i in range(17)],
        "id_a long, id_b long",
    ).filter(F.col("id_a") != F.col("id_b"))
    a = sorted(map(tuple, pagerank(edges, n_iter=12).collect()))
    b = sorted(
        map(tuple, pagerank(edges, n_iter=12, checkpoint_every=5).collect())
    )
    assert a == b


def test_pagerank_and_cc_release_cached_blocks(spark):
    """pagerank/connected_components must not leak persisted blocks
    across calls (ADVICE r2 low #5): after the call returns and results
    are consumed, no new permanently-cached RDDs remain."""
    from ai_vector_database_converstion_from_pdf_spark.operators.graph import (
        connected_components,
        pagerank,
    )

    sc = spark.sparkContext
    jsc = sc._jsc.sc()

    def n_cached():
        return jsc.getPersistentRDDs().size()

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 5)], "id long")
    base = n_cached()
    pagerank(edges, n_iter=3).collect()
    cc = connected_components(nodes, edges.select("id_a", "id_b"))
    cc.collect()
    # localCheckpoint blocks tie to the returned frames' RDD lifetime,
    # not to a persist the operator forgot; explicit persists are gone
    assert n_cached() <= base + 2  # the two localCheckpoint results only
