"""Relational core — SURVEY.md §2.1/§2.2/§2.4/§2.6/§2.7/§2.8.

Each query re-expresses an operator the reference specifies (cited per
query) on the driver fixture schema, with a DuckDB oracle. DataFrame
API first; Catalyst handles pushdown/pruning — the physical plans are
asserted in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse_spark.catalog import load_tables
from datawarehouse_spark.queries.qutil import davg, dsum, sql_davg, sql_dsum
from datawarehouse_spark.queries.registry import query


# --------------------------------------------------------------------------
# §2.1 scans / §2.2 projection & predicates
# --------------------------------------------------------------------------

@query(
    "s1_scan_project",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def s1_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/P1 — table scan + projection (reference docs/explain.md:38-48)."""
    t = load_tables(spark, sf_dir, ("region",))
    return t["region"].select("r_regionkey", "r_name")


@query(
    "p2_filter_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_size, p_retailprice
    FROM part
    WHERE p_size >= 10 AND p_size < 40 AND p_retailprice * 12 > 11500
      AND p_brand <> 'Brand#3'
    """,
)
def p2_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P3 — comparison predicates >,>=,<,<>; arithmetic in predicate
    (reference docs/explain.md:17, docs/sql规范.md:100)."""
    t = load_tables(spark, sf_dir, ("part",))
    p = t["part"]
    return p.filter(
        (F.col("p_size") >= 10)
        & (F.col("p_size") < 40)
        & (F.col("p_retailprice") * 12 > 11500)
        & (F.col("p_brand") != "Brand#3")
    ).select("p_partkey", "p_name", "p_size", "p_retailprice")


@query(
    "p4_like_patterns",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_name LIKE '%re%' AND lower(p_type) NOT LIKE '%brass%'
    """,
)
def p4_like_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/F1 — LIKE / NOT LIKE with wildcards + lower()
    (reference docs/explain.md:17 `app_name like "%同城%"`, docs/HiveSQL.md:7)."""
    t = load_tables(spark, sf_dir, ("part",))
    p = t["part"]
    return p.filter(
        F.col("p_name").like("%re%") & ~F.lower(F.col("p_type")).like("%brass%")
    ).select("p_partkey", "p_name", "p_type")


@query(
    "p5_in_list",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_orderstatus
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderstatus IN ('F', 'P')
    """,
)
def p5_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 — IN value lists (reference docs/HiveSQL.md:106)."""
    t = load_tables(spark, sf_dir, ("orders",))
    o = t["orders"]
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_orderstatus").isin("F", "P")
    ).select("o_orderkey", "o_orderpriority", "o_orderstatus")


@query(
    "p6_date_range",
    oracle=f"""
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {sql_dsum('l_extendedprice')} AS base_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def p6_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 — range predicate on the date/partition column; prunes at scan
    (reference docs/HiveSQL.md:107 `dt >= '2019-03-01' and dt <= ...`)."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    li = t["lineitem"]
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1997-01-01").cast("timestamp")
    return (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice").alias("base_price"),
        )
    )


@query(
    "p7_null_predicates",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT CASE WHEN o_totalprice > 300000 THEN NULL ELSE o_orderpriority END
               AS o_orderpriority
      FROM orders
    )
    WHERE o_orderpriority IS NOT NULL
    GROUP BY 1
    """,
)
def p7_null_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7/P8 — NULL-producing CASE branch + IS NOT NULL filter
    (reference docs/sql规范.md:135-143, docs/sql调优.md:48)."""
    t = load_tables(spark, sf_dir, ("orders",))
    o = t["orders"]
    pri = F.when(F.col("o_totalprice") > 300000, F.lit(None)).otherwise(
        F.col("o_orderpriority")
    )
    return (
        o.select(pri.alias("o_orderpriority"))
        .filter(F.col("o_orderpriority").isNotNull())
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "p9_exists_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def p9_exists_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9/J11 — EXISTS correlated subquery as LEFT SEMI join
    (reference docs/sql规范.md:54-58)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    big = t["orders"].filter(F.col("o_totalprice") > 400000)
    return (
        t["customer"]
        .join(big, t["customer"].c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


@query(
    "p10_not_exists_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
    """,
)
def p10_not_exists_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10/J12 — NOT EXISTS as LEFT ANTI join (reference docs/sql规范.md:82-87)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    huge = t["orders"].filter(F.col("o_totalprice") > 450000)
    return (
        t["customer"]
        .join(huge, t["customer"].c_custkey == huge.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
    )


@query(
    "p11_boolean_connectives",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders
    WHERE (o_orderstatus = 'F' AND o_totalprice > 200000)
       OR (o_orderpriority LIKE '1-%' AND NOT o_orderstatus = 'O')
    """,
)
def p11_boolean_connectives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 — AND/OR/NOT composition (reference docs/sql规范.md:111-127)."""
    t = load_tables(spark, sf_dir, ("orders",))
    o = t["orders"]
    return o.filter(
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 200000))
        | (F.col("o_orderpriority").like("1-%") & ~(F.col("o_orderstatus") == "O"))
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority")


# --------------------------------------------------------------------------
# §2.4 aggregations
# --------------------------------------------------------------------------

@query(
    "a1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/A6/A8/A9 — the TPC-H Q1 shape: partial→final hash aggregation
    with 8 aggregates over 2 group keys (reference docs/explain.md:49-67 for
    the hash/mergepartial modes; docs/olap.md:58 sanctions TPC-H class)."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    li = t["lineitem"].filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(disc_price, 4).alias("sum_disc_price"),
        dsum(charge, 6).alias("sum_charge"),
        davg("l_quantity").alias("avg_qty"),
        davg("l_extendedprice").alias("avg_price"),
        davg("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "a5_conditional_multi_distinct",
    oracle=f"""
    SELECT CAST(ts AS DATE) AS dt,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS uv,
           CAST(COUNT(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS BIGINT) AS click_uv,
           CAST(COUNT(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS BIGINT) AS view_uv,
           CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS BIGINT) AS purchase_uv,
           CAST(COUNT(DISTINCT CASE WHEN event_type = 'signup' THEN user_id END) AS BIGINT) AS signup_uv,
           CAST(COUNT(DISTINCT CASE WHEN event_type = 'error' THEN user_id END) AS BIGINT) AS error_uv,
           CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click_pv,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase_pv,
           CAST(COUNT(*) AS BIGINT) AS pv,
           {sql_dsum("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS purchase_amt,
           {sql_dsum('value')} AS total_value,
           {sql_davg('value')} AS avg_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY 1
    """,
)
def a5_conditional_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A5 — the reference's flagship 14-aggregate conditional aggregation
    (6 conditional count-distincts + plain aggs in ONE query,
    docs/HiveSQL.md:6-22). Spark plans multiple distincts via `expand`;
    at 100 TB prefer the partition-prune + two-level rewrite the reference
    itself applies (docs/HiveSQL.md:74-90) — see bench notes."""
    t = load_tables(spark, sf_dir, ("events",))
    e = t["events"]

    def uv(event: str):
        return F.countDistinct(
            F.when(F.col("event_type") == event, F.col("user_id"))
        ).alias(f"{event}_uv")

    return e.groupBy(F.to_date("ts").alias("dt")).agg(
        F.countDistinct("user_id").alias("uv"),
        uv("click").alias("click_uv"),
        uv("view").alias("view_uv"),
        uv("purchase").alias("purchase_uv"),
        uv("signup").alias("signup_uv"),
        uv("error").alias("error_uv"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("click_pv"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchase_pv"),
        F.count(F.lit(1)).alias("pv"),
        dsum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
        ).alias("purchase_amt"),
        dsum("value").alias("total_value"),
        davg("value").alias("avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@query(
    "a7_min_max_times",
    oracle="""
    SELECT user_id,
           CAST(MIN(epoch_us(ts)) AS BIGINT) AS first_time_us,
           CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_time_us,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def a7_min_max_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — min/max event time per user (reference `min(time_local) as
    first_time, max(time_local) as last_time` docs/HiveSQL.md:117-118).
    Times as unix microseconds: both engines floor parquet ns → µs."""
    t = load_tables(spark, sf_dir, ("events",))
    return t["events"].groupBy("user_id").agg(
        F.min(F.unix_micros("ts")).alias("first_time_us"),
        F.max(F.unix_micros("ts")).alias("last_time_us"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "a8_avg_having",
    oracle=f"""
    SELECT c_nationkey,
           {sql_davg('c_acctbal')} AS avg_bal,
           CAST(COUNT(*) AS BIGINT) AS n_cust
    FROM customer
    GROUP BY c_nationkey
    HAVING COUNT(*) > 40
    """,
)
def a8_avg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/A10 — AVG + HAVING post-aggregation filter
    (reference docs/sql规范.md:216-227)."""
    t = load_tables(spark, sf_dir, ("customer",))
    return (
        t["customer"]
        .groupBy("c_nationkey")
        .agg(
            davg("c_acctbal").alias("avg_bal"),
            F.count(F.lit(1)).alias("n_cust"),
        )
        .filter(F.col("n_cust") > 40)
    )


@query(
    "a12_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def a12_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 — DISTINCT set projection (reference docs/sql规范.md:82-87,210)."""
    t = load_tables(spark, sf_dir, ("customer",))
    return t["customer"].select("c_mktsegment", "c_nationkey").distinct()


@query(
    "a16_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def a16_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16 — MOLAP-style cube materialization: all dimension combinations
    (reference: Kylin cube enumeration docs/olap.md:11-24)."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    return t["lineitem"].cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity").alias("sum_qty"),
    )


@query(
    "a16_rollup",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('o_totalprice')} AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def a16_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16 — hierarchical rollup (Druid-style roll-up, docs/olap.md:25)."""
    t = load_tables(spark, sf_dir, ("orders",))
    return t["orders"].rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice").alias("total"),
    )


@query(
    "a17_top_n",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, t.revenue
    FROM (
      SELECT o_custkey, {sql_dsum('o_totalprice')} AS revenue
      FROM orders GROUP BY o_custkey
    ) t
    JOIN customer c ON c.c_custkey = t.o_custkey
    ORDER BY t.revenue DESC, c.c_custkey
    LIMIT 10
    """,
)
def a17_top_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17/O5 — TopN aggregate (Druid TopN, docs/olap.md:51): aggregate,
    then global ordered limit → Spark plans TakeOrderedAndProject (no full
    sort at scale). Deterministic tiebreak on c_custkey; revenue is exact
    (decimal sum) so the selected set matches the oracle bit-for-bit."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    rev = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(dsum("o_totalprice").alias("revenue"))
    )
    return (
        rev.join(t["customer"], rev.o_custkey == F.col("c_custkey"))
        .select("c_custkey", "c_name", "revenue")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


@query(
    "a18_approx_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_uv,
           TRUE AS approx_within_10pct
    FROM events
    GROUP BY event_type
    """,
)
def a18_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A18 — HyperLogLog approximate distinct (reference names Druid's
    non-exact dedup, docs/olap.md:46). At 100 TB this replaces the
    expand-based exact multi-distinct where ±2% error is acceptable.

    The HLL estimate itself is engine-specific, so the oracle checks the
    *property* instead: the estimate must land within 10% of the exact
    count (rsd=0.02, so 10% is a ~5-sigma bound — deterministic for
    fixed data since HLL register merges are order-independent)."""
    t = load_tables(spark, sf_dir, ("events",))
    return t["events"].groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_uv"),
        (
            F.abs(
                F.approx_count_distinct("user_id", 0.02)
                - F.countDistinct("user_id")
            )
            <= F.countDistinct("user_id") * 0.10
        ).alias("approx_within_10pct"),
    )


@query(
    "a11_salted_two_phase_agg",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS pv,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def a11_salted_two_phase_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 — two-phase salted aggregation for hot group keys (reference
    docs/sql调优.md:173-186: prefix random N → partial agg → strip → final).
    Deterministic salt (hash of a high-cardinality column mod 16) so the
    result is reproducible; the oracle is the plain single-phase GROUP BY —
    the equivalence IS the correctness claim. Decimal partials keep the
    two-phase double sum exact."""
    t = load_tables(spark, sf_dir, ("events",))
    e = t["events"].withColumn("_salt", F.pmod(F.xxhash64("event_id"), F.lit(16)))
    partial = e.groupBy("event_type", "_salt").agg(
        F.count(F.lit(1)).alias("_pv"),
        F.sum(F.col("value").cast("decimal(38,2)")).alias("_val"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("_pv").alias("pv"),
        F.sum("_val").cast("double").alias("total_value"),
    )


# --------------------------------------------------------------------------
# §2.6 sorts / limits
# --------------------------------------------------------------------------

@query(
    "o1_order_by_limit",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
)
def o1_order_by_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O4/O5 — global ORDER BY + LIMIT → TakeOrderedAndProject
    (reference docs/sql规范.md:168-183 cost note; docs/explain.md:80).
    Full tiebreak (orderkey, linenumber unique) keeps the top-k set
    deterministic."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(20)
    )


# --------------------------------------------------------------------------
# §2.7 set operations
# --------------------------------------------------------------------------

@query(
    "u1_union_all",
    oracle="""
    SELECT c_name AS name, 'customer' AS src FROM customer WHERE c_acctbal < 0
    UNION ALL
    SELECT s_name AS name, 'supplier' AS src FROM supplier WHERE s_acctbal < 0
    """,
)
def u1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — UNION ALL of homogeneous branches (reference docs/sql调优.md:63-70)."""
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    c = (
        t["customer"]
        .filter(F.col("c_acctbal") < 0)
        .select(F.col("c_name").alias("name"), F.lit("customer").alias("src"))
    )
    s = (
        t["supplier"]
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_name").alias("name"), F.lit("supplier").alias("src"))
    )
    return c.unionAll(s)


@query(
    "u2_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def u2_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 — UNION with dedup (reference docs/sql规范.md:147-166)."""
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    return (
        t["customer"].select(F.col("c_nationkey").alias("nationkey"))
        .union(t["supplier"].select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@query(
    "u3_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 350000
    INTERSECT
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0
    """,
)
def u3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 — INTERSECT (reference docs/sql规范.md:210-211)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    big_buyers = (
        t["orders"].filter(F.col("o_totalprice") > 350000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    positive = (
        t["customer"].filter(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return big_buyers.intersect(positive)


@query(
    "u4_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def u4_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4 — MINUS/EXCEPT (reference docs/sql规范.md:210-211)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    urgent = (
        t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return (
        t["customer"].select(F.col("c_custkey").alias("custkey")).subtract(urgent)
    )


# --------------------------------------------------------------------------
# §2.8 scalar functions
# --------------------------------------------------------------------------

@query(
    "f1_scalar_suite",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS lname,
           concat(p_brand, '_', p_type) AS brand_type,
           round(p_retailprice * 12, 2) AS annual_price,
           CAST(p_size % 5 AS BIGINT) AS size_mod,
           CASE WHEN p_size > 25 THEN 'big'
                WHEN p_size > 10 THEN 'mid'
                ELSE 'small' END AS size_class
    FROM part
    """,
)
def f1_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F5/F6/F7/F9 — lower, concat, round, mod, arithmetic, CASE
    (reference docs/HiveSQL.md:7, docs/sql调优.md:48,223, docs/sql规范.md:64-66,100)."""
    t = load_tables(spark, sf_dir, ("part",))
    p = t["part"]
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.concat("p_brand", F.lit("_"), "p_type").alias("brand_type"),
        F.round(F.col("p_retailprice") * 12, 2).alias("annual_price"),
        (F.col("p_size") % 5).cast("bigint").alias("size_mod"),
        F.when(F.col("p_size") > 25, "big")
        .when(F.col("p_size") > 10, "mid")
        .otherwise("small")
        .alias("size_class"),
    )


@query(
    "f12_json_extract",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
    FROM events
    """,
)
def f12_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 — semi-structured JSON access (reference docs/数据湖.md:4; Hive
    `get_json_object`). Stays JVM-side: Jackson-backed path extraction."""
    t = load_tables(spark, sf_dir, ("events",))
    e = t["events"]
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        k.alias("k_str"),
        k.cast("bigint").alias("k_int"),
    )


@query(
    "f13_date_parts",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS o_month,
           CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS o_quarter,
           CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS o_day,
           strftime(o_orderdate, '%Y-%m') AS o_month_str
    FROM orders
    """,
)
def f13_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13 — time-dimension functions year/month/quarter/day + formatting
    (reference time dimension docs/数据模型.md:28, F10 string dates)."""
    t = load_tables(spark, sf_dir, ("orders",))
    o = t["orders"]
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("o_year"),
        F.month("o_orderdate").cast("bigint").alias("o_month"),
        F.quarter("o_orderdate").cast("bigint").alias("o_quarter"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("o_day"),
        F.date_format("o_orderdate", "yyyy-MM").alias("o_month_str"),
    )


@query(
    "a15_key_distribution",
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt,
           (COUNT(*) * 1.0 / (SELECT COUNT(*) FROM events)) AS share
    FROM events GROUP BY user_id
    ORDER BY cnt DESC, user_id LIMIT 20
    """,
)
def a15_key_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15 — hot-key profiling (reference `RDD.countByKey()` + sample,
    docs/sql调优.md:29-36): top-20 keys by count with their share of all
    rows — the diagnosis step every skew remedy starts from. Ties broken
    by key for cross-engine determinism.

    Single scan: the total is re-aggregated from the per-key counts and
    cross-joined back as one broadcast row; ReuseExchange dedupes the
    shared groupBy shuffle, so `events` is read once (vs. the naive
    driver-side count() + groupBy = two full scans — at 100 TB the
    difference is a whole extra pass)."""
    t = load_tables(spark, sf_dir, ("events",))
    counts = t["events"].groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.col("cnt") / F.col("_total"))
        .drop("_total")
        .orderBy(F.desc("cnt"), F.asc("user_id"))
        .limit(20)
    )


@query(
    "p10_not_in_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey NOT IN
      (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
)
def p10_not_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 — NOT IN (subquery) through the SQL façade: Catalyst plans a
    null-aware anti join (the NOT IN→outer-join rewrite the reference
    documents, docs/sql规范.md:54-58). Complements p10_not_exists_anti,
    which is the DataFrame left-anti form with NOT EXISTS semantics."""
    load_tables(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_custkey NOT IN
          (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        """
    )


@query(
    "p13_scalar_subquery_anti",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 350000.0)
    """,
)
def p13_scalar_subquery_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — uncorrelated scalar subquery (global average as
    a predicate bound) + NOT EXISTS anti join: rich customers who never
    ordered. The scalar subquery broadcasts one value; the anti join is
    the reference's NOT-EXISTS rewrite (docs/sql规范.md:54-58). AVG is
    IEEE-deterministic here only because both engines aggregate the same
    doubles — so the bound is compared, never emitted."""
    load_tables(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 350000.0)
        """
    )


@query(
    "a19_groupagg_in_subquery",
    oracle=f"""
    SELECT o_orderkey, o_orderdate, {sql_dsum('l_quantity')} AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(38,2))) > 180.0
    )
    GROUP BY o_orderkey, o_orderdate
    """,
)
def a19_groupagg_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — IN over an aggregated-HAVING subquery (large
    orders), then re-aggregation after the join. Catalyst plans the IN
    as a semi join against the pre-aggregated side — one shuffle each on
    the shared key, co-partitioned thereafter."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,2)")).alias("q"))
        .filter(F.col("q") > 180.0)
        .select("l_orderkey")
    )
    return (
        t["orders"]
        .join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(dsum("l_quantity").alias("total_qty"))
    )


@query(
    "a21_approx_percentile",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5) AS exact_p50,
           TRUE AS approx_in_rank_band
    FROM orders GROUP BY o_orderpriority
    """,
)
def a21_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A20's scale path: t-digest approx_percentile (the 100 TB swap
    documented on a20). The sketch value is engine-specific, so the
    oracle checks the property: with accuracy=10000 the rank error is
    ≤ n/10000, so the estimate must land far inside the exact
    [p45, p55] band — deterministic for fixed data."""
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("exact_p50"),
            F.percentile("o_totalprice", F.lit(0.45)).alias("_lo"),
            F.percentile("o_totalprice", F.lit(0.55)).alias("_hi"),
            F.percentile_approx(
                "o_totalprice", F.lit(0.5), F.lit(10000)
            ).alias("_ap"),
        )
        .select(
            "o_orderpriority",
            "exact_p50",
            (
                (F.col("_ap") >= F.col("_lo")) & (F.col("_ap") <= F.col("_hi"))
            ).alias("approx_in_rank_band"),
        )
    )


@query(
    "a20_percentiles",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5) AS p50,
           quantile_cont(o_totalprice, 0.95) AS p95
    FROM orders GROUP BY o_orderpriority
    """,
)
def a20_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles per group (the OLAP latency-SLA
    query shape). Sort-based and order-independent, so bit-identical
    across engines — unlike stddev/corr whose partial-merge order
    varies. At extreme scale swap percentile→approx_percentile
    (t-digest) the same way A5 degrades to A18."""
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
            F.percentile("o_totalprice", F.lit(0.95)).alias("p95"),
        )
    )


@query(
    "f14_higher_order_arrays",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS a
      FROM documents
    )
    SELECT doc_id,
           CAST(len(a) AS BIGINT) AS n_tok,
           CAST(len(list_filter(a, x -> length(x) >= 6)) AS BIGINT)
             AS n_long,
           CAST(list_aggregate(list_transform(a, x -> length(x)), 'sum')
                AS BIGINT) AS total_len,
           CAST(list_aggregate(list_transform(a, x -> length(x)), 'max')
                AS BIGINT) AS max_len,
           list_filter(a, x -> length(x) >= 6)[1] AS first_long
    FROM toks
    """,
)
def f14_higher_order_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14 — higher-order array functions (transform / filter /
    aggregate / element_at), the modern Spark SQL surface that keeps
    per-row collection processing inside whole-stage codegen instead
    of falling back to a Python UDF. Token-level per-document stats
    computed entirely on the array; DuckDB's list_* functions are the
    oracle twins. All counts/lengths are exact integers; first_long
    is an exact string key (NULL when no token qualifies — both
    engines' out-of-range element access returns NULL)."""
    t = load_tables(spark, sf_dir, ("documents",))
    a = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    lens = F.transform(a, lambda x: F.length(x))
    longs = F.filter(a, lambda x: F.length(x) >= 6)
    return t["documents"].select(
        "doc_id",
        F.size(a).cast("bigint").alias("n_tok"),
        F.size(longs).cast("bigint").alias("n_long"),
        F.aggregate(
            lens, F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("total_len"),
        F.array_max(lens).cast("bigint").alias("max_len"),
        F.element_at(longs, 1).alias("first_long"),
    )


@query(
    "u5_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    EXCEPT ALL
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderpriority = '1-URGENT'
    """,
)
def u5_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5 — EXCEPT ALL, the bag-semantics difference U4's set form
    leaves out: each left multiplicity is reduced by the right
    multiplicity, so a customer with 5 orders of which 2 are urgent
    keeps 3 rows (U4 would drop the key entirely). Spark plans it as
    a single aggregate-based multiplicity join — no row explosion."""
    t = load_tables(spark, sf_dir, ("orders",))
    urgent = (
        t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return (
        t["orders"].select(F.col("o_custkey").alias("custkey"))
        .exceptAll(urgent)
    )


@query(
    "u6_intersect_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderpriority = '1-URGENT'
    INTERSECT ALL
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderstatus = 'F'
    """,
)
def u6_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U6 — INTERSECT ALL, the bag-semantics twin of U3: each key
    keeps min(left multiplicity, right multiplicity) rows."""
    t = load_tables(spark, sf_dir, ("orders",))
    a = (
        t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
    )
    b = (
        t["orders"].filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return a.intersectAll(b)


@query(
    "a26_market_basket",
    oracle="""
    WITH op0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    okeep AS (
      SELECT l_orderkey FROM op0 GROUP BY 1 HAVING COUNT(*) <= 64
    ),
    op AS (SELECT op0.* FROM op0 JOIN okeep USING (l_orderkey)),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM op),
    itm AS (SELECT l_partkey, COUNT(*) AS ni FROM op GROUP BY 1),
    pr AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n12
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    ),
    s AS (
      SELECT pr.p1, pr.p2, pr.n12, i1.ni AS n1, i2.ni AS n2, n.n_orders,
             CAST(pr.n12 AS DOUBLE) / n.n_orders AS support,
             CAST(pr.n12 AS DOUBLE) / i1.ni AS confidence,
             (CAST(pr.n12 AS DOUBLE) * n.n_orders)
               / (CAST(i1.ni AS DOUBLE) * i2.ni) AS lift
      FROM pr
      JOIN itm i1 ON i1.l_partkey = pr.p1
      JOIN itm i2 ON i2.l_partkey = pr.p2
      CROSS JOIN n
    )
    SELECT CAST(p1 AS BIGINT) AS p1, CAST(p2 AS BIGINT) AS p2,
           CAST(n12 AS BIGINT) AS n12,
           CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           ROUND(support, 6) AS support,
           ROUND(confidence, 6) AS confidence,
           ROUND(lift, 6) AS lift,
           CAST(ROW_NUMBER() OVER (ORDER BY lift DESC, p1, p2)
                AS BIGINT) AS rank
    FROM s
    QUALIFY rank <= 20
    """,
)
def a26_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A26 — 2-itemset association rules over order baskets (the
    market-basket mining staple): for parts co-purchased in ≥2 orders,
    emit support, confidence(p1→p2) and lift, top-20 by lift. The
    min-support HAVING is the Apriori downward-closure prune applied
    at the pair level.

    Exactness: counts are integers; support/confidence/lift are IEEE
    divisions of identical operands in identical order on both
    engines (the basket total is counted once and injected as a
    literal, like PageRank's N), rounded at 6 for the emitted values
    while the top-k ranks on the raw doubles (bit-identical → the
    rank tie-break (lift DESC, p1, p2) is total and engine-identical).

    Scale shape: the distinct (order, part) projection shuffles once
    on orderkey and the pair self-join reuses that partitioning; pair
    volume is Σ_orders C(basket,2) — basket-bounded, not catalog² —
    and the min-support filter is map-combined before the item-count
    broadcast joins (item counts are catalog-sized, hence broadcast).
    The per-order basket cap (≤64 distinct parts, mirrored in the
    oracle) is the standard mega-basket guard: C(basket,2) explodes
    on pathological transactions — the repo's own hot-key skew slice
    puts ~20k parts in one order (~200M pairs from a single basket)
    and the cap removes exactly that order while leaving every
    fixture basket (≤7 lines) untouched.
    """
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ("lineitem",))
    # ONE distinct basket projection, checkpointed: the basket count,
    # both self-join sides and the item counts all reuse it instead of
    # re-deduplicating the fact scan four times
    op0 = t["lineitem"].select("l_orderkey", "l_partkey").distinct()
    okeep = (op0.groupBy("l_orderkey")
             .agg(F.count(F.lit(1)).alias("_bs"))
             .filter(F.col("_bs") <= 64).select("l_orderkey"))
    # lazy checkpoint: the basket-count action below materializes it in
    # the same job (r14, guide §1.2 — one driver round-trip, not two)
    op = op0.join(okeep, "l_orderkey").localCheckpoint(eager=False)
    n_orders = op.select("l_orderkey").distinct().count()
    itm = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("ni"))
    a = op.select(F.col("l_orderkey").alias("ok"),
                  F.col("l_partkey").alias("p1"))
    b = op.select(F.col("l_orderkey").alias("ok"),
                  F.col("l_partkey").alias("p2"))
    pairs = (
        a.join(b, ["ok"])
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n12"))
        .filter(F.col("n12") >= 2)
    )
    i1 = itm.select(F.col("l_partkey").alias("p1"), F.col("ni").alias("n1"))
    i2 = itm.select(F.col("l_partkey").alias("p2"), F.col("ni").alias("n2"))
    scored = (
        pairs.join(F.broadcast(i1), "p1").join(F.broadcast(i2), "p2")
        .withColumn("support", F.col("n12").cast("double") / F.lit(n_orders))
        .withColumn("confidence",
                    F.col("n12").cast("double") / F.col("n1"))
        .withColumn(
            "lift",
            (F.col("n12").cast("double") * F.lit(n_orders))
            / (F.col("n1").cast("double") * F.col("n2")),
        )
    )
    top = scored.orderBy(F.desc("lift"), "p1", "p2").limit(20)
    rank_w = W.orderBy(F.desc("lift"), "p1", "p2")
    return top.select(
        "p1", "p2",
        F.col("n12").cast("bigint").alias("n12"),
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        F.round("support", 6).alias("support"),
        F.round("confidence", 6).alias("confidence"),
        F.round("lift", 6).alias("lift"),
        F.row_number().over(rank_w).cast("bigint").alias("rank"),
    )
