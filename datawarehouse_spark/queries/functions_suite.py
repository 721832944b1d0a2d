"""Scalar-function coverage — SURVEY.md §2.8 beyond the core F1-F13:
string, math, null-handling, conditional (DECODE) and date families of
the HiveQL surface the reference's workloads draw from. Every output
column is typed/aliased identically in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse_spark.catalog import load_tables
from datawarehouse_spark.queries.registry import query


@query(
    "f2_string_suite",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS u_brand,
           substring(p_name, 1, 10) AS name10,
           CAST(length(p_name) AS BIGINT) AS name_len,
           replace(p_type, ' ', '_') AS type_us,
           reverse(p_brand) AS rev_brand,
           CAST(strpos(p_name, 'a') AS BIGINT) AS first_a,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           left(p_type, 5) AS type5,
           repeat(p_brand, 2) AS brand2
    FROM part
    """,
)
def f2_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions: upper/substring/length/replace/reverse/instr/
    lpad/regexp_extract/left/repeat (HiveQL string surface)."""
    t = load_tables(spark, sf_dir, ("part",))
    p = t["part"]
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("u_brand"),
        F.substring("p_name", 1, 10).alias("name10"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_us"),
        F.reverse("p_brand").alias("rev_brand"),
        F.instr("p_name", "a").cast("bigint").alias("first_a"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.expr("left(p_type, 5)").alias("type5"),
        F.repeat(F.col("p_brand"), 2).alias("brand2"),
    )


@query(
    "f6_math_suite",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           sqrt(l_quantity) AS qty_sqrt,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod
    FROM lineitem
    WHERE l_orderkey < 1000
    """,
)
def f6_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions: abs/ceil/floor/sqrt/greatest/least/sign/mod —
    all correctly-rounded IEEE ops (no libm transcendentals in checked
    outputs; exp/ln differ across math libraries)."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    li = t["lineitem"].filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod"),
    )


@query(
    "f8_decode_coalesce",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'finished'
                              WHEN 'P' THEN 'pending' ELSE 'unknown' END AS status_desc,
           COALESCE(NULLIF(o_orderpriority, '5-LOW'), 'deprioritized') AS pri_or_default,
           (o_orderstatus = 'O') AS is_open
    FROM orders
    """,
)
def f8_decode_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 — Oracle-style DECODE as CASE chain (docs/sql规范.md:14-15) +
    COALESCE/NULLIF null plumbing (P7)."""
    t = load_tables(spark, sf_dir, ("orders",))
    o = t["orders"]
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "P", "pending")
        .otherwise("unknown")
        .alias("status_desc"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")),
            F.lit("deprioritized"),
        ).alias("pri_or_default"),
        (F.col("o_orderstatus") == "O").alias("is_open"),
    )


@query(
    "f10_date_suite",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT)
             AS days_to_98,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus_2m,
           CAST(EXTRACT(dow FROM o_orderdate) + 1 AS BIGINT) AS dow_sun1
    FROM orders
    """,
)
def f10_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10/F13 — date arithmetic: date_add, datediff, last_day,
    trunc-to-month, add_months, day-of-week (aligned to Hive's
    1=Sunday convention on both sides)."""
    t = load_tables(spark, sf_dir, ("orders",))
    o = t["orders"].withColumn("od", F.to_date("o_orderdate"))
    return o.select(
        "o_orderkey",
        F.date_add("od", 30).alias("due_date"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("od"))
        .cast("bigint")
        .alias("days_to_98"),
        F.last_day("od").alias("month_end"),
        F.trunc("od", "month").alias("month_start"),
        F.add_months("od", 2).alias("plus_2m"),
        F.dayofweek("o_orderdate").cast("bigint").alias("dow_sun1"),
    )


@query(
    "a16_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def a16_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16 — explicit GROUPING SETS through the SQL façade (the third
    cube form next to cube/rollup; Kylin-style partial combinations)."""
    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )
