"""Tier-2 correctness gate, run locally: every battery query vs its DuckDB
oracle at sf0.001 (fast) — mirrors the driver's CORRECTNESS check."""

from __future__ import annotations

import pytest

from sports_data_integration_and_forecasting_pipeline_spark.plans import QUERIES

from .conftest import TESTDATA_SMOKE
from .oracle import compare, duckdb_con


@pytest.fixture(scope="module")
def oracle(spark):
    con = duckdb_con(TESTDATA_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
def test_query_matches_oracle(spark, oracle, name):
    spec = QUERIES[name]
    got = spec.fn(spark, TESTDATA_SMOKE)
    assert got.columns, f"{name}: no columns"
    if spec.oracle is None:
        assert got.count() >= 0  # rows-only check (driver parity)
        return
    expected = oracle.sql(spec.oracle).df()
    problems = compare(got, expected)
    assert not problems, f"{name}: {problems}"
