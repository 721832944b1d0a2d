"""The correctness gate, run locally: every registered query with an
oracle must match DuckDB exactly (mirrors the driver's t2 check)."""

from __future__ import annotations

import pytest

from datawarehouse_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_ORACLE
from tests.oracle_compare import compare_query


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    ok, msg = compare_query(spark, duck, QUERIES[name], ORACLES[name], SF_ORACLE)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    assert df.count() >= 0
