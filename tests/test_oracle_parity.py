"""The correctness gate, run locally: every registered query with an
oracle must match DuckDB exactly (mirrors the driver's t2 check)."""

from __future__ import annotations

import pytest

from datawarehouse_spark.queries import ORACLES, QUERIES, QUERIES_RAW, TESTS_ONLY
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


@pytest.mark.parametrize("name", sorted(TESTS_ONLY))
def test_tests_only_queries_run(spark, name):
    """Raw queries kept out of the driver registry (no deterministic
    oracle) must still execute; their semantics are property-tested in
    tests/test_llm_ops.py / test_engine_and_multimodal.py."""
    df = QUERIES_RAW[name](spark, SF_ORACLE)
    assert df.count() >= 0
