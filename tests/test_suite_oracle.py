"""Every registered suite query must match its DuckDB oracle exactly
(the driver's correctness gate, replicated locally at sf0.001)."""

from __future__ import annotations

import pytest

from covid_19_fl_spark import suite

from .oracle import compare

ORACLE_CASES = sorted(suite.ORACLES)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(spark, sf_dir, name):
    df = suite.QUERIES[name](spark, sf_dir)
    compare(df, suite.ORACLES[name], sf_dir)


def test_every_query_runs(spark, sf_dir):
    for name, fn in suite.QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
