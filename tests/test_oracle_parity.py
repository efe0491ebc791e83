"""Run every registered query against its DuckDB oracle — pre-verifies the
driver's correctness gate (CORRECTNESS_r{N}.json) locally."""

from __future__ import annotations

import pytest

from tidb2dw_spark.entry_queries import ORACLES, QUERIES

from .util import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    if name in ORACLES:
        assert_matches_oracle(df, ORACLES[name], sf_dir)
    else:
        assert df.count() >= 0  # rows-only check for non-SQL-expressible ops
