"""Embedding quantization — storage/bandwidth scale path.

At 100 TB the embedding column dominates storage (the reference ships
float32 BLOBs, `vector_store.cpp:673-685`; 3072-dim float32 = 12 KB/row).
Symmetric int8 quantization cuts that 4x with ~1e-2 cosine error, and
scan-time dequantization stays a pure codegen'd expression. This is the
standard faiss/SQ8-style scheme expressed relationally:

  scale = max(|x_i|) / 127   (per row; 0-vector → scale 0)
  q_i   = round(x_i / scale) (int8 in [-127, 127])
  x'_i  = q_i * scale

Everything is ANSI-SQL-expressible, so the round-trip is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def quantize_col(vec: Column) -> Column:
    """array<float> → struct(scale double, q array<tinyint>)."""
    absmax = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    scale = absmax / F.lit(127.0)
    q = F.when(scale == 0.0, F.transform(vec, lambda x: F.lit(0).cast("tinyint"))).otherwise(
        F.transform(vec, lambda x: F.round(x.cast("double") / scale).cast("tinyint"))
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_col(qstruct: Column) -> Column:
    """struct(scale, q) → array<double> (reconstruction)."""
    return F.transform(qstruct["q"], lambda v: v.cast("double") * qstruct["scale"])


def quantize(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    return embeddings.select(
        F.col(id_col), quantize_col(F.col(vec_col)).alias("qemb")
    )


def reconstruction_report(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, cos_orig_recon) — cosine between original and reconstructed
    vector, the quantization-quality metric."""
    from ..functions.vector import cosine_rounded

    q = embeddings.select(
        F.col(id_col), F.col(vec_col), quantize_col(F.col(vec_col)).alias("qemb")
    )
    recon = q.withColumn("recon", dequantize_col(F.col("qemb")))
    return recon.select(
        F.col(id_col),
        cosine_rounded(F.col(vec_col), F.col("recon")).alias("cos_recon"),
    )
