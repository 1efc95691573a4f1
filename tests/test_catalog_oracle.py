"""Every catalog query with an oracle must match DuckDB on the smoke SF.

This is a local replica of the driver's t2 gate (CORRECTNESS_r{N}.json).
Queries without an oracle still must run and return a stable schema.
"""

from __future__ import annotations

import pytest

from datagouvfr_data_pipelines_spark import plans
from tests.oracle_harness import compare, duckdb_conn

QUERIES = plans.queries()
ORACLES = plans.oracle_sql()


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb_conn(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_against_oracle(name, spark, sf_dir, oracle):
    df = QUERIES[name](spark, sf_dir)
    if name in ORACLES:
        res = compare(name, df, oracle, ORACLES[name])
        assert res.ok, f"{name}: {res.detail}"
        if res.detail:
            print(f"{name}: {res.detail}")
    else:
        rows = df.count()
        assert rows >= 0
        assert len(df.columns) > 0
