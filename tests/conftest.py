import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="run tests marked slow (stress tiers, recall-floor sweeps, "
        "the full 190-query oracle sweep)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: stress-tier / sweep tests, opt-in via --runslow or "
        "SPARK_GRAFT_SLOW_TESTS=1 (VERDICT r13 #8: the default suite "
        "must finish inside the driver's pytest budget; the slow set "
        "re-covers ground the driver separately enforces — the full "
        "oracle sweep is its CORRECTNESS gate — or measures quality "
        "floors on generated stress fixtures)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get(
        "SPARK_GRAFT_SLOW_TESTS"
    ) == "1":
        return
    skip = pytest.mark.skip(reason="slow: opt-in via --runslow / SPARK_GRAFT_SLOW_TESTS=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    from ai_vector_database_converstion_from_pdf_spark.session import get_spark

    s = get_spark("pytest", cpus=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'")
    yield con
