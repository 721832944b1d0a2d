"""Catalog layer: load the fixture star schema and register views.

The reference's warehouse is layered Hive tables (ODS/DWD/DIM/DWS/ADS,
docs/数据模型如何评论好坏.md:22); here the driver-provided parquet tables
play the DWD/DIM roles. ``load_tables`` registers each as a temp view so
both the DataFrame API and the SQL façade see the same catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse_spark.session import apply_runtime_profile

#: All driver-generated fixture tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any scale factor the
#: reference contemplates (region=5 rows, nation=25; docs/sql调优.md:190).
BROADCAST_DIMS = {"region", "nation"}


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Read fixture parquet tables and register them as temp views."""
    apply_runtime_profile(spark)
    out: dict[str, DataFrame] = {}
    for name in names:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df = _normalize_nanos(df)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def _normalize_nanos(df: DataFrame) -> DataFrame:
    """Normalize fixture timestamp columns to TIMESTAMP_LTZ µs.

    - ns epochs read as BIGINT under ``spark.sql.legacy.parquet.nanosAsLong``
      → floor-divide to µs (matches DuckDB, which truncates TIMESTAMP_NS
      parquet columns to µs on read).
    - TIMESTAMP_NTZ (parquet isAdjustedToUTC=false when
      ``inferTimestampNTZ`` couldn't be disabled) → LTZ treating the wall
      clock as UTC, tz-independently via epoch micros.
    """
    for field in df.schema.fields:
        simple = field.dataType.simpleString()
        if field.name == "ts" and simple == "bigint":
            # integer DIV, not `/`: ns epochs (~1.7e18) exceed double precision
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif simple == "timestamp_ntz":
            df = df.withColumn(
                field.name,
                F.timestamp_micros(
                    F.expr(
                        "timestampdiff(MICROSECOND, "
                        f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {field.name})"
                    )
                ),
            )
    return df
