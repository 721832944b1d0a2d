"""Query inventory — importing this package populates the registry.

``QUERIES_RAW`` / ``ORACLES_RAW`` hold every fine-grained operator
query (one per SURVEY §2 row). ``QUERIES`` / ``ORACLES`` are the
driver-facing registry (≤50 entries): flagship queries pass through,
operator families are composed into union suites (see ``suites``).
"""

from datawarehouse_spark.queries import (  # noqa: F401
    functions_suite,
    joins,
    llm,
    multimodal,
    profiles,
    relational,
    tpch,
    warehouse,
    windows,
)
from datawarehouse_spark.queries.registry import ORACLES as ORACLES_RAW
from datawarehouse_spark.queries.registry import QUERIES as QUERIES_RAW
from datawarehouse_spark.queries.suites import ORACLES, QUERIES, TESTS_ONLY

__all__ = ["QUERIES", "ORACLES", "QUERIES_RAW", "ORACLES_RAW", "TESTS_ONLY"]
