"""Hash-bucket partitioned workspace: doc-scoped reads must prune to one
partition directory, and bucketed/unbucketed appends must not mix."""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from tests.test_workspace_streaming_multimodal import _chunks_df


def test_bucketed_layout_and_pruning(spark, tmp_path):
    from ai_vector_database_converstion_from_pdf_spark.sinks import Workspace

    ws = Workspace(spark, str(tmp_path / "bws"))
    ws.add_chunks(_chunks_df(spark, n=40), partition_buckets=8)

    # physical layout: _bucket=k directories
    dirs = [d for d in os.listdir(ws._tbl("chunks")) if d.startswith("_bucket=")]
    assert len(dirs) > 1

    # doc-scoped read returns exactly that doc's rows
    rows = ws.chunks_for_doc("7").collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == "7"

    # the plan carries a partition filter on _bucket (pruning evidence)
    df = ws.chunks_for_doc("7")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_bucket" in plan

    # mixing layouts is rejected
    with pytest.raises(ValueError):
        ws.add_chunks(_chunks_df(spark, n=2), partition_buckets=None)
    with pytest.raises(ValueError):
        ws.add_chunks(_chunks_df(spark, n=2), partition_buckets=4)

    # search still works over the bucketed table (extra _bucket column
    # must not disturb the pipeline)
    from ai_vector_database_converstion_from_pdf_spark.functions.embed import hash_embed
    from ai_vector_database_converstion_from_pdf_spark.plans.hybrid import hybrid_search

    res = hybrid_search(
        ws.chunks().select(F.col("id").alias("doc_id"), "text"),
        ws.chunks().select(F.col("id").alias("vec_id"), "embedding"),
        "merge fast table",
        hash_embed("merge fast table", 16),
        k=5,
    ).collect()
    assert len(res) == 5

    # boosts are append-only deltas: the bucketed chunk layout must be
    # untouched and the effective boost folded in at read time
    ws.boost_entry(7, 0.1)
    dirs_after = [
        d for d in os.listdir(ws._tbl("chunks")) if d.startswith("_bucket=")
    ]
    assert sorted(dirs_after) == sorted(dirs)
    assert abs(
        ws.chunks_for_doc("7").collect()[0]["boost_factor"] - 1.1
    ) < 1e-9
