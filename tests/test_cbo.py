"""Cost-based-optimizer evidence (SURVEY §3/§4): with catalog tables
ANALYZEd, Spark's CBO join-reorder rewrites a deliberately bad join
order — the statistics-driven planning a warehouse engine is expected
to perform (dq_join_cardinality_estimate exposes the same estimate
arithmetic as a query; this pins that Catalyst actually CONSUMES such
statistics). Uses saveAsTable + ANALYZE (CBO reads catalog stats, not
parquet footers), session-scoped dynamic confs restored afterwards."""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE

_TABLES = ("customer", "orders", "nation")

# fact ⋈ fact first, selective dim LAST — the order a cost model must fix
_BAD_ORDER_SQL = """
SELECT n.n_name, COUNT(*) AS cnt
FROM cbo_orders o
JOIN cbo_customer c ON o.o_custkey = c.c_custkey
JOIN cbo_nation n ON c.c_nationkey = n.n_nationkey
WHERE n.n_name = 'CHINA'
GROUP BY n.n_name
"""


@pytest.fixture(scope="module")
def cbo_tables(spark):
    for t in _TABLES:
        spark.read.parquet(f"{SF_SMOKE}/{t}.parquet") \
            .write.mode("overwrite").saveAsTable(f"cbo_{t}")
        spark.sql(f"ANALYZE TABLE cbo_{t} COMPUTE STATISTICS FOR ALL COLUMNS")
    yield
    for t in _TABLES:
        spark.sql(f"DROP TABLE IF EXISTS cbo_{t}")


def _first_join_inputs(spark, sql: str) -> str:
    """Relations feeding the INNERMOST join of the optimized plan."""
    plan = spark.sql(sql)._jdf.queryExecution().optimizedPlan().toString()
    deepest, best = None, -1
    for line in plan.splitlines():
        stripped = line.lstrip(" :+-")
        if stripped.startswith("Join Inner"):
            depth = len(line) - len(stripped)
            if depth > best:
                deepest, best = line, depth
    assert deepest is not None
    # the innermost join's subtree is everything indented deeper below it
    lines = plan.splitlines()
    i = lines.index(deepest)
    subtree = []
    for line in lines[i + 1:]:
        if len(line) - len(line.lstrip(" :+-")) <= best:
            break
        subtree.append(line)
    return "\n".join(subtree)


def _set(spark, key: str, val: str):
    old = spark.conf.get(key, None)
    spark.conf.set(key, val)
    return old


def test_cbo_reorders_selective_dim_inward(spark, cbo_tables):
    saved = {
        k: _set(spark, k, v)
        for k, v in {
            "spark.sql.cbo.enabled": "true",
            "spark.sql.cbo.joinReorder.enabled": "true",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        }.items()
    }
    try:
        inner = _first_join_inputs(spark, _BAD_ORDER_SQL)
        # cost model must join customer to the CHINA-filtered nation
        # FIRST (tiny intermediate), deferring the fact table
        assert "cbo_nation" in inner and "cbo_customer" in inner, inner
        assert "cbo_orders" not in inner, inner
        # sanity: result unchanged by the reorder
        rows = spark.sql(_BAD_ORDER_SQL).collect()
        assert len(rows) in (0, 1)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_without_cbo_join_order_follows_sql(spark, cbo_tables):
    saved = {
        k: _set(spark, k, v)
        for k, v in {
            "spark.sql.cbo.enabled": "false",
            "spark.sql.cbo.joinReorder.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        }.items()
    }
    try:
        inner = _first_join_inputs(spark, _BAD_ORDER_SQL)
        # rule-only planning keeps the written order: orders ⋈ customer
        assert "cbo_orders" in inner and "cbo_customer" in inner, inner
        assert "cbo_nation" not in inner, inner
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
