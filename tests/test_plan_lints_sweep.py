"""Anti-pattern sweep: every driver-registry query's physical plan must
be free of the two hard scale-killers the advisor lints for — an
unbroadcast cartesian product and a row-at-a-time Python UDF. This is
the mechanical form of the round bar "no row-python in the hot path,
no accidental O(n·m) joins" across the WHOLE registry, not just the
queries someone remembered to eyeball."""

from __future__ import annotations

import pytest

from datawarehouse_spark.plans import advisor
from datawarehouse_spark.queries import QUERIES
from tests.conftest import SF_ORACLE

FORBIDDEN = {"cartesian-product", "row-python-udf"}


@pytest.mark.parametrize("name", list(QUERIES))
def test_no_plan_antipatterns(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    hits = {a.rule for a in advisor.lint_plan(df)} & FORBIDDEN
    assert not hits, f"{name}: {hits}"
