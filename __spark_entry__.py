"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (and the
LLM-pipeline extensions), one callable per operator.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query, for the
driver's side-by-side correctness gate at sf0.01.

Implementation lives in ``datawarehouse_spark/``; this module only
re-exports the registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datawarehouse_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's 14-aggregate conditional multi-distinct
    aggregation (docs/HiveSQL.md:6-22) on the events fact table."""
    return QUERIES["a5_conditional_multi_distinct"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
