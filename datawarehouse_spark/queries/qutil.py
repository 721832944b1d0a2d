"""Shared helpers for oracle-exact query outputs.

Cross-engine float determinism: a SUM over doubles depends on
accumulation order, which differs between Spark (partial/final over
shuffled partitions) and DuckDB (sequential). We therefore never sum
raw doubles in a checked query output. Instead we cast each addend to
a DECIMAL whose scale exactly represents the true value (the fixture
money columns carry 2 decimals; products of two such columns carry 4,
of three carry 6), sum exactly, and cast the exact result back to
DOUBLE — a deterministic nearest-double conversion that is
bit-identical in both engines. Averages are expressed as
exact_sum_double / count, again bit-deterministic IEEE division.

The same convention is mirrored in every oracle SQL string:
``CAST(SUM(CAST(x AS DECIMAL(38, s))) AS DOUBLE)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact sum of a double column via decimal, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent average: exact decimal sum divided by count."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def sql_dsum(expr: str, scale: int = 2) -> str:
    """Oracle-side rendering of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2) -> str:
    return f"({sql_dsum(expr, scale)} / COUNT({expr}))"
