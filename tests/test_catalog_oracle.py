"""Oracle-equivalence tests: every catalog query with an oracle must match
DuckDB on sf0.01 — the same gate the driver applies (CORRECTNESS_r{N})."""

import pytest

from tools.verify_local import canon_rows
from tests.conftest import SF_ORACLE, SF_SMOKE


def _catalog():
    import __spark_entry__ as m

    return m.queries(), m.oracle_sql()


QUERIES, ORACLES = _catalog()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_equivalence(name, spark, duck):
    sdf = QUERIES[name](spark, SF_ORACLE)
    spark_rows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLES:
        assert len(spark_rows) >= 0  # rows-only check
        return
    res = duck.sql(ORACLES[name])
    duck_rows = res.fetchall()
    assert [c.lower() for c in sdf.columns] == [c.lower() for c in res.columns]
    assert len(spark_rows) == len(duck_rows)
    a, b = canon_rows(spark_rows), canon_rows(duck_rows)
    assert a == b, f"first diffs: {[(x, y) for x, y in zip(a, b) if x != y][:3]}"


def test_entry_smoke(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "score" in df.columns
