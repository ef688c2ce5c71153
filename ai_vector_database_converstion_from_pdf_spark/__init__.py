"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference `12geniusbeast12/AI-Vector-DataBase-converstion-from-pdf`
(a Qt6/SQLite PDF->vector-DB hybrid-retrieval app; see SURVEY.md).

Architecture: pure DataFrame/SQL operators planned by Catalyst; Parquet
columnar storage; LLM touchpoints (embed/rerank/summarize/synthesize) are
pluggable pandas-UDF interfaces with deterministic local implementations;
everything time-dependent takes an injected ``asof`` timestamp; all sorts
break ties by id ascending so results are reproducible (the reference uses
unstable std::sort — our order is a deterministic refinement).

Scale stance (100 TB): brute-force ops exist for parity/correctness, each
with an LSH/bucketed scale path; joins broadcast small sides; aggregations
are expressed so Catalyst plans partial (map-side) aggregation; per-doc
sequential semantics (chunker) run as `applyInPandas` so documents
parallelize across executors.
"""

from .session import get_spark  # noqa: F401

__version__ = "0.1.0"
