"""User-profile tag pipelines — SURVEY.md §2.10 X2-X4 + 画像 docs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse_spark.catalog import load_tables
from datawarehouse_spark.functions.udfs import (
    high_value_user_rule,
    propensity_score,
    user_profile,
)
from datawarehouse_spark.queries.qutil import sql_dsum
from datawarehouse_spark.queries.registry import query

_PROFILE_SQL = f"""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS pv,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
             AS purchases,
           {sql_dsum("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")}
             AS purchase_amt
    FROM events GROUP BY user_id
"""


@query(
    "x4_rule_tag_profile",
    oracle=f"""
    SELECT user_id, pv, purchases, purchase_amt,
           (purchases >= 3 AND purchase_amt > 500.0 AND pv > 50) AS high_value
    FROM ({_PROFILE_SQL})
    """,
)
def x4_rule_tag_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-class tag via Arrow pandas UDF over per-user aggregates
    (docs/画像简介.md:18). The oracle re-derives the rule in pure SQL —
    proving the UDF path computes exactly what the SQL form declares."""
    t = load_tables(spark, sf_dir, ("events",))
    prof = user_profile(t["events"])
    return prof.withColumn(
        "high_value",
        high_value_user_rule(F.col("purchases"), F.col("purchase_amt"), F.col("pv")),
    )


@query(
    "x4_mining_tag_scores",
    oracle=f"""
    SELECT user_id,
           ROUND(least(1.0, greatest(0.0,
             purchases * 0.1 + purchase_amt * 0.001 + pv * 0.002)), 6)
             AS score
    FROM ({_PROFILE_SQL})
    """,
)
def x4_mining_tag_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mining-class tag: model-inference column via pandas UDF
    (docs/画像简介.md:20-23); linear stand-in keeps it oracle-exact."""
    t = load_tables(spark, sf_dir, ("events",))
    prof = user_profile(t["events"])
    return prof.select(
        "user_id",
        propensity_score(
            F.col("purchases").cast("double"),
            F.col("purchase_amt"),
            F.col("pv").cast("double"),
        ).alias("score"),
    )


@query(
    "x2_predicate_table_join",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type
    FROM events e
    JOIN (VALUES ('purchase'), ('signup')) AS allow(event_type)
      ON e.event_type = allow.event_type
    WHERE e.value > 20
    """,
)
def x2_predicate_table_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — the reference's alternative to a mega-WHERE predicate list:
    broadcast-join against a predicate table (docs/sql调优.md:118-124)."""
    t = load_tables(spark, sf_dir, ("events",))
    allow = spark.createDataFrame(
        [("purchase",), ("signup",)], "event_type string"
    )
    return (
        t["events"]
        .filter(F.col("value") > 20)
        .join(F.broadcast(allow), "event_type")
        .select("event_id", "user_id", "event_type")
    )


@query(
    "x5_rfm_segmentation",
    oracle=f"""
    WITH base AS (
      SELECT o_custkey AS custkey,
             MAX(CAST(o_orderdate AS DATE)) AS last_dt,
             CAST(COUNT(*) AS BIGINT) AS f_cnt,
             {sql_dsum("o_totalprice")} AS m_amt
      FROM orders GROUP BY 1
    ), scored AS (
      SELECT custkey, last_dt, f_cnt, m_amt,
             CAST(NTILE(5) OVER (ORDER BY last_dt DESC, custkey)
                  AS BIGINT) AS r_score,
             CAST(NTILE(5) OVER (ORDER BY f_cnt DESC, custkey)
                  AS BIGINT) AS f_score,
             CAST(NTILE(5) OVER (ORDER BY m_amt DESC, custkey)
                  AS BIGINT) AS m_score
      FROM base
    )
    SELECT custkey, last_dt, f_cnt, m_amt, r_score, f_score, m_score,
           CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
             || CAST(m_score AS VARCHAR) AS rfm
    FROM scored
    """,
)
def x5_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the classic ADS-layer profile:
    recency (last order date), frequency (order count), monetary
    (exact-decimal revenue sum), each quintile-bucketed by NTILE over
    a total order (metric + custkey tiebreak, so bucket assignment is
    engine-identical), concatenated into the familiar 'rfm' code.

    Scale shape: one map-combined per-customer aggregate; each
    quintile is then an EXACT distributed NTILE — a range-partitioned
    global rank (operators/rank.py::global_rank: per-block row_number
    + a broadcast triangular-join offset table) fed through the ANSI
    NTILE bucket formula (rank.py::ntile_from_rank). No single-
    partition window anywhere: the classic ntile() formulation would
    funnel the 100M–1B-row customer rollup through ONE task three
    times; this runs three fully-parallel range shuffles and is
    bit-identical to the oracle's NTILE because the bucket arithmetic
    is the NTILE contract itself, not an approximation.
    """
    from datawarehouse_spark.operators.rank import (
        global_rank,
        ntile_from_rank,
    )
    from datawarehouse_spark.queries.qutil import dsum

    t = load_tables(spark, sf_dir, ("orders",))
    base = t["orders"].groupBy(
        F.col("o_custkey").alias("custkey")
    ).agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_dt"),
        F.count(F.lit(1)).cast("bigint").alias("f_cnt"),
        dsum("o_totalprice").alias("m_amt"),
    )

    def quintile(df: DataFrame, metric: str, score: str) -> DataFrame:
        ranked = global_rank(
            df,
            [F.desc(metric), F.asc("custkey")],
            rank_col="_gr",
            total_col="_n",
        )
        return ranked.withColumn(
            score, ntile_from_rank("_gr", "_n", 5)
        ).drop("_gr", "_n")

    scored = quintile(base, "last_dt", "r_score")
    scored = quintile(scored, "f_cnt", "f_score")
    scored = quintile(scored, "m_amt", "m_score")
    return scored.select(
        "custkey", "last_dt", "f_cnt", "m_amt",
        "r_score", "f_score", "m_score",
    ).withColumn(
        "rfm",
        F.concat(F.col("r_score").cast("string"),
                 F.col("f_score").cast("string"),
                 F.col("m_score").cast("string")),
    )
