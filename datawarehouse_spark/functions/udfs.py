"""UDF surface — SURVEY.md §2.10 (X1-X4).

The reference's dev model is "SQL plus extension UDFs" for both batch
and streaming (docs/实时数仓.md:42). Here: Arrow-vectorized pandas UDFs
(the fast Python path) registered into the session so the SQL façade
can call them, plus the profile-tag pipelines they power
(docs/画像简介.md: rule-class and mining-class tags).

Every UDF is IEEE-deterministic (no transcendentals, no RNG) so its
output is oracle-checkable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, DoubleType


@F.pandas_udf(BooleanType())
def high_value_user_rule(purchases: pd.Series, purchase_amt: pd.Series,
                         pv: pd.Series) -> pd.Series:
    """Rule-class tag (docs/画像简介.md:18 — "月登陆次数>10 && 月充值次数>20
    && 月充值额度>1000" shape), thresholds fitted to the fixture scale."""
    return (purchases >= 3) & (purchase_amt > 500.0) & (pv > 50)


@F.pandas_udf(DoubleType())
def propensity_score(purchases: pd.Series, purchase_amt: pd.Series,
                     pv: pd.Series) -> pd.Series:
    """Mining-class tag (docs/画像简介.md:20-23): model inference as a
    column. Stand-in linear scorer (a real model swaps in here via the
    same Arrow batch path). The score is rounded to 6 decimals: the
    true value has ≤5 (2-dec money × 0.001), so rounding absorbs the
    float-vs-decimal evaluation gap between engines — found by the
    r9 sf0.1 parity sweep, where purchase_amt sums large enough to
    cross the repr boundary (0.89987 vs 0.8998700000000001) that the
    sf0.01 gate never reached."""
    raw = purchases * 0.1 + purchase_amt * 0.001 + pv * 0.002
    return raw.clip(lower=0.0, upper=1.0).round(6)


def register_udfs(spark: SparkSession) -> None:
    """X1 — make the UDFs callable from SQL (`spark.udf.register`)."""
    spark.udf.register("high_value_user_rule", high_value_user_rule)
    spark.udf.register("propensity_score", propensity_score)


def user_profile(events: DataFrame) -> DataFrame:
    """Per-user behavioral aggregate feeding the tag UDFs (X3: the
    pandas-compute layer consumes aggregates, not raw events)."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("pv"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchases"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value"))
            .otherwise(0.0)
            .cast("decimal(38,2)")
        )
        .cast("double")
        .alias("purchase_amt"),
    )
