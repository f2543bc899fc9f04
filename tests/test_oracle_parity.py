"""Driver-contract parity: every oracle-backed query must match DuckDB
at sf0.001 (the driver re-runs the same compare at sf0.01)."""

import pytest

from knowledge_harvest_from_lms_spark.plans.oracle_check import (
    check_query,
    duckdb_connection,
)
from knowledge_harvest_from_lms_spark.plans.queries import ORACLES, QUERIES

from conftest import SF_SMALL


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_SMALL)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, con, name):
    issues = check_query(spark, con, name, SF_SMALL, QUERIES, ORACLES)
    assert not issues, issues


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
