"""Query inventory — importing this package populates the registry."""

from datawarehouse_spark.queries import joins, llm, relational, windows  # noqa: F401
from datawarehouse_spark.queries.registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
