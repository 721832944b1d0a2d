"""Query registry — the bridge to the driver contract.

Each implemented operator from SURVEY.md §2 registers:
  * a query callable ``(spark, sf_dir) -> DataFrame`` (the Spark-native
    implementation), and
  * optionally a DuckDB-compatible ANSI SQL oracle string producing the
    same rows/columns on the same parquet tables.

Correctness conventions (driver hash-compares values after sorting
columns by name):
  * alias every computed column, identically on both sides;
  * never emit the raw ``events.ts`` column (parquet stores nanoseconds;
    Spark truncates to microseconds while DuckDB keeps ns) — always
    date_trunc / unix_micros first;
  * round double aggregates at a precision where the true decimal value
    is exactly representable (sums of 2-dec money → round 2; products of
    2-dec values → round 4) so float summation order can't flip the hash;
  * cast integral outputs to BIGINT on both sides (DuckDB sum(int) is
    HUGEINT otherwise);
  * every nondeterministic choice (top-k ties, "first" rows) carries an
    explicit deterministic tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query implementation and (optionally) its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
