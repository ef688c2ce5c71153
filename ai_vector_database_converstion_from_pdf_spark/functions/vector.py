"""Vector column expressions — JVM-side, whole-stage-codegen'd.

Reference analog: `VectorStore::cosineSimilarity` (`vector_store.cpp:750-762`)
— float32 inputs, double accumulator, left-to-right loop. We reproduce that
numerically: `aggregate` folds left-to-right with a DoubleType accumulator
over float32 array elements cast to double, so results are bit-compatible
with a sequential double accumulation (and with DuckDB's list_dot_product
on the same values to ~1e-15, which rounding to 6 decimals absorbs).

Staying in built-in expressions (not UDFs) keeps the 100 TB scan inside
whole-stage codegen over columnar Parquet batches — the scale path for
brute-force scoring. ANN variants live in operators/similarity.py.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a[i]*b[i] with double accumulation, left-to-right."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """cosine similarity; 0.0 when either norm is 0 (reference returns 0
    on mismatch/empty, `vector_store.cpp:752-756`)."""
    d = dot(a, b)
    n = l2_norm(a) * l2_norm(b)
    return F.when(n == 0.0, F.lit(0.0)).otherwise(d / n)


def cosine_rounded(a: Column, b: Column, digits: int = 6) -> Column:
    """Cosine rounded for cross-engine determinism: ranking on the rounded
    value + id tiebreak makes Spark and the DuckDB oracle order-identical."""
    return F.round(cosine(a, b), digits)


def query_vector_lit(vec: Iterable[float]) -> Column:
    """A literal query vector column (broadcast to every row for free as a
    constant in the codegen'd expression — no join, no shuffle), built
    as ONE SQL `array(...)` expression string: PySpark's F.lit(list)
    makes one py4j round-trip PER ELEMENT (measured 58 ms for 64 dims,
    5.2 s for a 9k-element flat centroid block on this gateway), while
    one expr() parse is ~0.6 ms at 64 dims. Bit-exact: repr(float)
    round-trips in Python and Double.parseDouble picks the same nearest
    double for the same decimal string (verified across denormals, max
    double and -0.0). Non-finite values (no query path produces them)
    fall back to the element-wise form, which handles NaN/Inf."""
    vals = [float(x) for x in vec]
    if vals and all(v == v and abs(v) != float("inf") for v in vals):
        return F.expr("array(" + ",".join(repr(v) + "D" for v in vals) + ")")
    return F.array(*[F.lit(x) for x in vals])


def long_array_lit(vals: Iterable[int]) -> Column:
    """ONE-py4j-call array<long> literal — the integer sibling of
    query_vector_lit, for model-sized plan constants (probe weight
    tables, packed bloom bitmaps, centroid id lists). Decimal integer
    parsing is trivially exact."""
    vs = [int(v) for v in vals]
    if not vs:
        return F.expr("CAST(array() AS ARRAY<BIGINT>)")
    return F.expr("array(" + ",".join(f"{v}L" for v in vs) + ")")
