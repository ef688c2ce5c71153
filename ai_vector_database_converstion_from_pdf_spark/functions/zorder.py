"""Z-order (Morton) interleaving for multi-column data clustering.

Sorting a table by (a, b) gives perfect parquet min/max pruning on `a`
and none on `b`; interleaving the two columns' bits into one Morton key
and sorting by THAT gives useful pruning on BOTH — the Delta Lake
`OPTIMIZE ZORDER BY` idea, reproduced here as a pure column expression
so layout optimization stays declarative (repartitionByRange + sort on
the key) and the key itself is engine-portable integer math
(oracle-checkable bit-for-bit).

Scale shape: the key is map-side-only bit arithmetic (whole-stage
codegen, no UDF); clustering a 100 TB table is one range shuffle on the
key — exactly what a sort-based OPTIMIZE costs — after which every file
covers a small hyper-rectangle of the (a, b, ...) space and min/max
stats prune scans on any single dimension.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton-interleave the low `bits` bits of each column (cast to
    long, masked non-negative) into one long key. Dimension d
    contributes its bit i at output position i * n_dims + d, so all
    dimensions alternate at every bit level. Columns must already be
    scaled to fit `bits` bits for best locality (values above the mask
    wrap — still deterministic, but locality degrades)."""
    n = len(cols)
    mask = (1 << bits) - 1
    terms = []
    for d, c in enumerate(cols):
        x = c.cast("long").bitwiseAND(F.lit(mask))
        for i in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(x, i).bitwiseAND(F.lit(1)), i * n + d
                )
            )
    return reduce(lambda a, b: a + b, terms)


def zorder_key_sql(cols: list[str], bits: int = 16) -> str:
    """The identical interleave as ANSI/DuckDB SQL (for oracles)."""
    n = len(cols)
    mask = (1 << bits) - 1
    terms = []
    for d, c in enumerate(cols):
        x = f"(({c})::BIGINT & {mask})"
        for i in range(bits):
            terms.append(f"((({x} >> {i}) & 1) << {i * n + d})")
    return "(" + " + ".join(terms) + ")"


def zorder_cluster(
    df: DataFrame, cols: list[Column], n_partitions: int, bits: int = 16
) -> DataFrame:
    """Cluster `df` for multi-dimension data skipping: one range shuffle
    on the Morton key, rows sorted by it within each output file."""
    keyed = df.withColumn("_zkey", zorder_key(cols, bits))
    return (
        keyed.repartitionByRange(n_partitions, "_zkey")
        .sortWithinPartitions("_zkey")
    )
