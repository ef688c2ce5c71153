"""Q15/Q16 — neighbor-context window + context assembly.

Reference: `VectorStore::getContext` (`vector_store.cpp:687-702`) — concat
text for chunk_idx in [i-off, i+off] within the same doc, ordered — and
`getSourceContext` (`vector_store.cpp:706-748`) which widens the window to
≥3 for synthesis stages ("Dynamic Context Packing") and recomputes trust.

Spark-first: a textbook window frame — partitionBy(doc).orderBy(idx)
.rowsBetween(-off, +off) with an ordered string agg. One shuffle on the
partition key, then O(1) per row; at 100 TB the partition key (doc_id) is
high-cardinality and unskewed, the natural layout if chunks are stored
bucketed by doc_id (then even the shuffle disappears).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def neighbor_context(
    chunks: DataFrame,
    offset: int,
    doc_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    text_col: str = "text",
    out_col: str = "context",
    sep: str = " \n",
) -> DataFrame:
    """Adds `out_col` = ordered concat of text over rows [-offset, +offset]
    within the doc (frame order = idx asc, matching the reference's
    `ORDER BY chunk_idx`)."""
    w = (
        Window.partitionBy(doc_col)
        .orderBy(F.col(idx_col).asc())
        .rowsBetween(-offset, offset)
    )
    return chunks.withColumn(
        out_col, F.array_join(F.collect_list(F.col(text_col)).over(w), sep)
    )


def source_context(
    chunks: DataFrame,
    offset: int,
    stage: str,
    doc_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    text_col: str = "text",
) -> DataFrame:
    """Q16: widened frame for synthesis/refined stages
    (`vector_store.cpp:729-733`: offset = max(offset, 3))."""
    eff = max(offset, 3) if stage in ("synthesis", "refined") else offset
    out = neighbor_context(chunks, eff, doc_col, idx_col, text_col)
    return out.withColumn("retrieval_stage", F.lit(stage)).withColumn(
        "context_chunk_id",
        F.concat_ws("_", F.col(doc_col).cast("string"), F.col(idx_col).cast("string")),
    )
