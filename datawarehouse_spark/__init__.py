"""datawarehouse_spark — a PySpark-native analytics engine.

Re-expresses the full capability surface documented by the reference
knowledge base (simbafl/DataWarehouse, see SURVEY.md) as idiomatic
Spark: DataFrame/SQL plans optimized by Catalyst, Structured
Streaming for the real-time warehouse, and Pandas-UDF-backed
operators only where built-ins cannot express the semantics.

Layout:
  session     — tuned SparkSession factory (reference-derived profile)
  catalog     — table registration over the driver-provided parquet fixtures
  queries/    — the operator inventory of SURVEY.md §2, one registered
                query per operator, each paired with a DuckDB oracle SQL
  operators/  — reusable operator implementations (skew salting, dedup,
                similarity, text analysis)
  sources/    — IO: partitioned writes, CTAS, dynamic-partition insert,
                compaction
  streaming/  — Structured Streaming pipelines sharing transforms with batch
  plans/      — explain-parity reporter + SQL advisor lints
"""

from datawarehouse_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
