"""Joins — SURVEY.md §2.3 (J1-J13).

Broadcast/skew strategy notes per query; the physical-plan assertions
(broadcast chosen, AQE skew-join armed) live in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse_spark.catalog import load_tables
from datawarehouse_spark.queries.qutil import davg, dsum, sql_davg, sql_dsum
from datawarehouse_spark.queries.registry import query


@query(
    "j1_multiway_inner",
    oracle=f"""
    SELECT c_mktsegment, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY c_mktsegment, o_orderpriority
    """,
)
def j1_multiway_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — multi-way inner equi-join feeding an aggregation (reference
    3-way join docs/HiveSQL.md:149-157). lineitem⋈orders shuffles on
    orderkey; customer is small relative to the facts — at 100 TB the
    optimizer broadcasts it (we leave the choice to Catalyst/AQE here
    since customer grows with SF)."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "customer"))
    o = t["orders"].filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
    joined = (
        t["lineitem"]
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.groupBy("c_mktsegment", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum(revenue, 4).alias("revenue"),
    )


@query(
    "j1_six_way_star",
    oracle=f"""
    SELECT n_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
    GROUP BY n_name
    """,
)
def j1_six_way_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J4/J14 — the TPC-H Q5 shape: 6-way star join (local-supplier
    revenue by nation). Facts shuffle on their keys; nation/region
    broadcast; the c↔s same-nation condition rides on the supplier join.
    This is the multi-table-join capability bar of docs/olap.md:97."""
    t = load_tables(
        spark, sf_dir,
        ("customer", "orders", "lineitem", "supplier", "nation", "region"),
    )
    joined = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name").isin("ASIA", "EUROPE"))
    )
    return joined.groupBy("n_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "j2_left_outer",
    oracle=f"""
    SELECT c_custkey,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           COALESCE({sql_dsum('o_totalprice')}, 0.0) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def j2_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — left outer join preserving unmatched dimension rows
    (reference docs/sql调优.md:45-50)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("total_spent"),
        )
    )


@query(
    "j4_broadcast_dims",
    oracle=f"""
    SELECT r_name, n_name,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           {sql_davg('c_acctbal')} AS avg_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def j4_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — map/broadcast join: tiny dims shipped to every task, no shuffle
    of the fact side (reference docs/sql调优.md:188-198). Explicit
    ``F.broadcast`` on both dims — the star-schema pattern that holds at
    any fact size."""
    t = load_tables(spark, sf_dir, ("customer", "nation", "region"))
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            davg("c_acctbal").alias("avg_bal"),
        )
    )


@query(
    "j5_salted_skew_join",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def j5_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/J6 — skew-join via salting: the probe side gets a deterministic
    salt in [0,8), the build side is replicated 8× with every salt value,
    and the join key becomes (key, salt) — the reference's solution 7
    (docs/sql调优.md:234-250; 60min→10min). The oracle is the plain join:
    salting must be semantically invisible. In production AQE's skew-join
    split does this adaptively; the manual form remains for extreme
    single-key skew and for aggregation skew."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    n_salt = 8
    li = t["lineitem"].withColumn(
        "_salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(n_salt))
    )
    o = t["orders"].withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    # join on (salt AND key) so the shuffle key is (salt, orderkey)
    joined = li.join(
        o,
        (li["_salt"] == o["_salt"]) & (li["l_orderkey"] == o["o_orderkey"]),
        "inner",
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum("l_quantity").alias("sum_qty"),
    )


@query(
    "j7_null_key_salted",
    oracle="""
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(COUNT(p_partkey) AS BIGINT) AS n_matched
    FROM (
      SELECT CASE WHEN l_quantity < 3 THEN NULL ELSE l_partkey END AS join_key
      FROM lineitem
    ) l
    LEFT JOIN part ON l.join_key = p_partkey
    GROUP BY p_brand
    """,
)
def j7_null_key_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 — null-key salted outer join (reference docs/sql调优.md:44-51:
    `case when a.useid is null then concat('hive', rand()) ... end`).
    Null keys can't match but all land in one reducer; we scatter them
    with a salt that never collides with real keys (negative), keeping
    results identical to the naive join — which is the oracle."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"].select(
        F.when(F.col("l_quantity") < 3, F.lit(None))
        .otherwise(F.col("l_partkey"))
        .alias("join_key"),
        "l_orderkey",
        "l_linenumber",
    )
    # scatter the null bucket: hash-salt nulls into negative keys that
    # cannot exist in part (p_partkey >= 1)
    salted = li.withColumn(
        "_k",
        F.coalesce(
            F.col("join_key"),
            -(F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(1 << 20)) + 1),
        ),
    )
    joined = salted.join(t["part"], F.col("_k") == F.col("p_partkey"), "left")
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.count("p_partkey").alias("n_matched"),
    )


@query(
    "j8_cast_key_join",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS uv
    FROM events
    JOIN customer ON CAST(user_id AS VARCHAR) = CAST(c_custkey AS VARCHAR)
    GROUP BY c_mktsegment
    """,
)
def j8_cast_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 — mixed-type join keys unified by explicit cast (reference
    `on cast(log.id as int) = p.pid` docs/sql调优.md:53-57). Without the
    cast, engines hash different representations to different reducers."""
    t = load_tables(spark, sf_dir, ("events", "customer"))
    return (
        t["events"]
        .join(
            t["customer"],
            F.col("user_id").cast("string") == F.col("c_custkey").cast("string"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("uv"),
        )
    )


@query(
    "j9_cross_join",
    oracle="SELECT n_name, r_name FROM nation CROSS JOIN region",
)
def j9_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 — Cartesian expansion join (reference `users d join num e` with
    no ON, docs/sql调优.md:219-221). Broadcast nested loop on Spark."""
    t = load_tables(spark, sf_dir, ("nation", "region"))
    return t["nation"].crossJoin(t["region"]).select("n_name", "r_name")


@query(
    "j10_or_join_union_rewrite",
    oracle="""
    SELECT DISTINCT o_orderkey, c_custkey
    FROM orders JOIN customer
      ON o_custkey = c_custkey OR (o_orderkey % 1500) = c_custkey
    """,
)
def j10_or_join_union_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 — OR-of-keys join rewritten as UNION of two equi-joins
    (reference docs/sql调优.md:59-71: one table joined on either of two
    columns → `union all` + single join). The OR form forces a nested-loop
    (O(n·m)); the rewrite is two hash joins + dedup — the only shape that
    survives at 100 TB. Oracle runs the naive OR join."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    o, c = t["orders"], t["customer"]
    pairs1 = o.join(c, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "c_custkey"
    )
    pairs2 = o.join(c, (F.col("o_orderkey") % 1500) == F.col("c_custkey")).select(
        "o_orderkey", "c_custkey"
    )
    return pairs1.union(pairs2).distinct()


@query(
    "j13_theta_join",
    oracle="""
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders JOIN nation
      ON (o_orderkey % 25) = n_nationkey AND o_totalprice > n_nationkey * 1000
    GROUP BY n_name
    """,
)
def j13_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J13 — equi key on an expression + a non-equi theta component
    (reference `mod(a.login_time,30)+1 = b.number` docs/sql调优.md:223).
    Catalyst extracts the equi part for hashing; the theta term becomes a
    post-join filter."""
    t = load_tables(spark, sf_dir, ("orders", "nation"))
    return (
        t["orders"]
        .join(
            F.broadcast(t["nation"]),
            ((F.col("o_orderkey") % 25) == F.col("n_nationkey"))
            & (F.col("o_totalprice") > F.col("n_nationkey") * 1000),
        )
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "j6_split_skew_union",
    oracle=f"""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c_mktsegment
    """,
)
def j6_split_skew_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 proper — the reference's 6-step split-skew recipe
    (docs/sql调优.md:202-232): profile key counts, peel hot keys (>80
    events) into a salted join, join the cold rest plainly, UNION ALL.
    The oracle is the plain join — splitting and salting must be
    semantically invisible. Differs from j5_salted_skew_join (solution
    7, full expansion): only the hot slice pays ×n_salt replication."""
    from datawarehouse_spark.operators.skew import split_skew_join

    t = load_tables(spark, sf_dir, ("events", "customer"))
    joined = split_skew_join(
        t["events"], t["customer"], "user_id", "c_custkey",
        hot_threshold=80, n_salt=8,
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("total_value"),
    )


@query(
    "j15_asof_join",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id,
             epoch_us(ts) AS purchase_us, value AS purchase_value
      FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, epoch_us(ts) AS click_us,
             CAST(MAX(event_id) AS BIGINT) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY 1, 2
    )
    SELECT p.purchase_id, p.user_id,
           CAST(p.purchase_us AS BIGINT) AS purchase_us,
           p.purchase_value,
           c.click_id,
           CAST(c.click_us AS BIGINT) AS click_us,
           CAST(p.purchase_us - c.click_us AS BIGINT) AS gap_us
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.purchase_us >= c.click_us
    """,
)
def j15_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (stretch beyond the reference's J-inventory; its
    attribution interval join docs/实时数仓.md is the bounded cousin):
    each purchase picks up the user's most recent prior click. Spark
    has no native ASOF JOIN — the union-window operator
    (operators/temporal.py) resolves it with ONE shuffle on user_id,
    no pair fan-out; the oracle is DuckDB's native ASOF LEFT JOIN."""
    from datawarehouse_spark.operators.temporal import asof_join

    t = load_tables(spark, sf_dir, ("events",))
    ev = t["events"].withColumn("us", F.unix_micros("ts"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("us").alias("purchase_us"),
        F.col("value").alias("purchase_value"),
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("us").alias("click_us"))
        .agg(F.max("event_id").alias("click_id"))
        .select("user_id", "click_id", "click_us")
    )
    out = asof_join(
        purchases, clicks, on="user_id",
        left_time="purchase_us", right_time="click_us",
    )
    return out.select(
        "purchase_id", "user_id", "purchase_us", "purchase_value",
        "click_id", "click_us",
        (F.col("purchase_us") - F.col("click_us")).alias("gap_us"),
    )
