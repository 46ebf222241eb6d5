"""Oracle-differential tests for every query that declares oracle SQL.

This mirrors the driver's CORRECTNESS gate: Spark result vs DuckDB result
on /root/testdata/sf0.01, order-insensitive, exact values (floats are
rounded inside the queries themselves)."""

from __future__ import annotations

import pytest

from sales_forecast_mlops_at_scale_spark.plans import all_queries

from .conftest import SF_DIR, assert_matches_oracle

CASES = sorted((n, q) for n, q in all_queries().items() if q.oracle is not None)


@pytest.mark.parametrize("name,qdef", CASES, ids=[n for n, _ in CASES])
def test_query_matches_oracle(spark, oracle, name, qdef):
    df = qdef.fn(spark, SF_DIR)
    assert_matches_oracle(df, oracle, qdef.oracle)


def test_all_queries_have_unique_rowcounts_smoke(spark):
    # cheap sanity: every query runs on the smoke SF without error
    from .conftest import SMOKE_SF_DIR

    for name, qdef in all_queries().items():
        n = qdef.fn(spark, SMOKE_SF_DIR).count()
        assert n >= 0, name
