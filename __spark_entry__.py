"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship hybrid-retrieval query at sf0.001;
`queries()` / `oracle_sql()` expose the operator inventory (SURVEY.md §2)
with DuckDB oracles. Implementations live in
`ai_vector_database_converstion_from_pdf_spark/` — this file is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the engine package lives beside this file; make the import CWD-independent
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from ai_vector_database_converstion_from_pdf_spark import catalog
from ai_vector_database_converstion_from_pdf_spark.session import tune_for_session


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_for_session(spark)
    return catalog.hybrid_rrf(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
