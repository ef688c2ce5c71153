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
