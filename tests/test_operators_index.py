"""OPERATORS.md freshness gate: the committed index must equal a fresh
render from the catalog registry (VERDICT r7 #8). Pure-python, no Spark
session — fails the suite the moment someone registers a query without
regenerating the index."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_operators_index_is_fresh():
    import make_index

    committed = open(os.path.join(REPO, "OPERATORS.md")).read()
    assert make_index.render() == committed, (
        "OPERATORS.md is stale — regenerate with: python tools/make_index.py"
    )


def test_operators_index_covers_registry():
    import make_index

    from ai_vector_database_converstion_from_pdf_spark import catalog

    out = make_index.render()
    for name in catalog.queries():
        assert f"| `{name}` |" in out
