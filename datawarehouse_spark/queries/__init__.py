"""Query inventory — importing this package populates the registry."""

from datawarehouse_spark.queries import (  # noqa: F401
    functions_suite,
    joins,
    llm,
    multimodal,
    profiles,
    relational,
    warehouse,
    windows,
)
from datawarehouse_spark.queries.registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
