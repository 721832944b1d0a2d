"""Window functions — SURVEY.md §2.5 (W1-W6) + S13 window dedupe.

Frame semantics are the hard part (SURVEY §7.3.1): Hive/Spark/DuckDB all
default to RANGE UNBOUNDED PRECEDING → CURRENT ROW when ORDER BY is
present, so `last_value` over the default frame returns the *current*
row — w2 pins that; partition-max intent needs an explicit frame (w1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datawarehouse_spark.catalog import load_tables
from datawarehouse_spark.queries.registry import query


@query(
    "w1_first_last_value",
    oracle="""
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_event,
           last_value(event_type) OVER (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """,
)
def w1_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W2 — first/last event per user without collapsing rows (reference
    docs/HiveSQL.md:101-102). last_value takes the explicit full frame —
    the trap the reference itself documents by rewriting it to max()."""
    t = load_tables(spark, sf_dir, ("events",))
    w = W.partitionBy("user_id").orderBy("event_id")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        t["events"]
        .select(
            "user_id",
            F.first("event_type").over(w).alias("first_event"),
            F.last("event_type").over(w_full).alias("last_event"),
        )
        .distinct()
    )


@query(
    "w2_last_value_default_frame",
    oracle="""
    SELECT event_id, user_id,
           last_value(event_type) OVER
             (PARTITION BY user_id ORDER BY event_id) AS lv
    FROM events
    """,
)
def w2_last_value_default_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — pins the default-frame semantics: with ORDER BY and no frame,
    last_value = current row (docs/HiveSQL.md:102 + SURVEY §7.3.1)."""
    t = load_tables(spark, sf_dir, ("events",))
    w = W.partitionBy("user_id").orderBy("event_id")
    return t["events"].select(
        "event_id", "user_id", F.last("event_type").over(w).alias("lv")
    )


@query(
    "w3_w4_partition_count_sum",
    oracle="""
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS dt,
           CAST(count(*) OVER w AS BIGINT) AS day_pv,
           CAST(sum(CAST(value AS DECIMAL(38,2))) OVER w AS DOUBLE) AS day_value
    FROM events
    WINDOW w AS (PARTITION BY user_id, CAST(ts AS DATE))
    """,
)
def w3_w4_partition_count_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3/W4 — whole-partition count/sum without collapsing (reference
    docs/HiveSQL.md:103-104: per-day event count + duration total)."""
    t = load_tables(spark, sf_dir, ("events",))
    e = t["events"].withColumn("dt", F.to_date("ts"))
    w = W.partitionBy("user_id", "dt")
    return (
        e.select(
            "user_id",
            "dt",
            F.count(F.lit(1)).over(w).alias("day_pv"),
            F.sum(F.col("value").cast("decimal(38,2)")).over(w)
            .cast("double")
            .alias("day_value"),
        )
        .distinct()
    )


@query(
    "w5_window_vs_groupby_join",
    oracle="""
    WITH bounds AS (
      SELECT user_id,
             CAST(MIN(epoch_us(ts)) AS BIGINT) AS first_time_us,
             CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_time_us
      FROM events GROUP BY user_id
    ), daily AS (
      SELECT user_id, CAST(ts AS DATE) AS dt,
             CAST(COUNT(*) AS BIGINT) AS day_pv
      FROM events GROUP BY 1, 2
    )
    SELECT d.user_id, d.dt, b.first_time_us, b.last_time_us, d.day_pv
    FROM daily d JOIN bounds b ON d.user_id = b.user_id
    """,
)
def w5_window_vs_groupby_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 — the reference's window↔(groupby+join) equivalence pair
    (docs/HiveSQL.md:95-157): we run the WINDOW form, the oracle runs the
    reference's own decomposition into temp aggregates + join. Matching
    results replicate the reference's correctness methodology (§5.2)."""
    t = load_tables(spark, sf_dir, ("events",))
    e = t["events"].select(
        "user_id", F.to_date("ts").alias("dt"), F.unix_micros("ts").alias("ts_us")
    )
    w_user = W.partitionBy("user_id")
    w_day = W.partitionBy("user_id", "dt")
    return (
        e.select(
            "user_id",
            "dt",
            F.min("ts_us").over(w_user).alias("first_time_us"),
            F.max("ts_us").over(w_user).alias("last_time_us"),
            F.count(F.lit(1)).over(w_day).alias("day_pv"),
        )
        .distinct()
    )


@query(
    "w6_ranking",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, rn, rnk, drnk
    FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             CAST(row_number() OVER (PARTITION BY p_brand
               ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rn,
             CAST(rank() OVER (PARTITION BY p_brand
               ORDER BY p_retailprice DESC) AS BIGINT) AS rnk,
             CAST(dense_rank() OVER (PARTITION BY p_brand
               ORDER BY p_retailprice DESC) AS BIGINT) AS drnk
      FROM part
    )
    WHERE rn <= 3
    """,
)
def w6_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6/A17 — ranking trio + top-k per group (reference capability bar
    docs/olap.md:82,97; TopN docs/olap.md:51). row_number carries a full
    tiebreak for determinism; rank/dense_rank legitimately tie."""
    t = load_tables(spark, sf_dir, ("part",))
    w_det = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    w_tie = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    return (
        t["part"]
        .select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.row_number().over(w_det).cast("bigint").alias("rn"),
            F.rank().over(w_tie).cast("bigint").alias("rnk"),
            F.dense_rank().over(w_tie).cast("bigint").alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "w6_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER w AS BIGINT) AS gap_us,
           lead(event_type) OVER w AS next_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """,
)
def w6_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 — lag/lead analytics (sessionization building block)."""
    t = load_tables(spark, sf_dir, ("events",))
    w = W.partitionBy("user_id").orderBy("event_id")
    ts_us = F.unix_micros("ts")
    return t["events"].select(
        "user_id",
        "event_id",
        (ts_us - F.lag(ts_us).over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_event"),
    )


@query(
    "s13_window_dedupe",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM (
      SELECT event_id, user_id, event_type,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY event_id) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
)
def s13_window_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 — keep-first dedupe via row_number (reference's ROWID dedupe
    DELETE, docs/sql规范.md:21-24, re-expressed as the idiomatic
    warehouse pattern)."""
    t = load_tables(spark, sf_dir, ("events",))
    w = W.partitionBy("user_id", "event_type").orderBy("event_id")
    return (
        t["events"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type")
    )


@query(
    "w7_explicit_frames",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(38,2))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total,
           CAST(SUM(CAST(value AS DECIMAL(38,2))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS moving_3,
           CAST(COUNT(*) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS BIGINT) AS n_all
    FROM events
    """,
)
def w7_explicit_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 — explicit ROWS/RANGE frames: running total, 3-row moving sum,
    whole-partition count. Frames never re-shuffle — one Exchange on
    user_id serves all three. Decimal-exact sums keep the running
    values engine-portable; (ts, event_id) ordering makes ROWS frames
    deterministic under ts ties."""
    t = load_tables(spark, sf_dir, ("events",))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    dec = F.col("value").cast("decimal(38,2)")
    return t["events"].select(
        "event_id",
        "user_id",
        F.sum(dec).over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double").alias("running_total"),
        F.sum(dec).over(w.rowsBetween(-2, W.currentRow))
        .cast("double").alias("moving_3"),
        F.count(F.lit(1)).over(
            w.rangeBetween(W.unboundedPreceding, W.unboundedFollowing)
        ).cast("bigint").alias("n_all"),
    )


@query(
    "w8_funnel_conversion",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events GROUP BY user_id
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(CASE WHEN first_click IS NOT NULL THEN 1 END) AS BIGINT)
             AS clickers,
           CAST(COUNT(CASE WHEN first_purchase > first_click THEN 1 END) AS BIGINT)
             AS converted
    FROM firsts f JOIN customer c ON f.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def w8_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite funnel: per-user first click / first purchase (A4-style
    conditional MIN — one events pass, no self-join), then a join onto
    the customer dim and a segment rollup. The per-user agg is
    map-combined, so the shuffle carries one row per user — the shape
    that holds when events is the 100 TB side. customer grows with SF,
    so the broadcast decision is left to Catalyst/AQE (j1 note)."""
    t = load_tables(spark, sf_dir, ("events", "customer"))
    firsts = t["events"].groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    joined = firsts.join(
        t["customer"],
        F.col("user_id") == F.col("c_custkey"),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.when(F.col("first_click").isNotNull(), 1)).alias("clickers"),
        F.count(
            F.when(F.col("first_purchase") > F.col("first_click"), 1)
        ).alias("converted"),
    )


@query(
    "w9_cohort_retention",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS DATE) AS d FROM events
    ), c AS (
      SELECT user_id, d, MIN(d) OVER (PARTITION BY user_id) AS cohort_dt
      FROM e
    )
    SELECT cohort_dt,
           CAST(date_diff('day', cohort_dt, d) AS BIGINT) AS day_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM c
    GROUP BY cohort_dt, day_offset
    """,
)
def w9_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the warehouse staple the reference's
    DWS/ADS layer exists to serve: users are cohorted by their first
    active day, and each (cohort, day-offset) cell counts the distinct
    users still active that many days later.

    The cohort date is a window MIN over the user partition, NOT an
    aggregate-then-self-join — events is scanned ONCE, shuffled once by
    user_id (one skinny (user, day) row per event), and the
    (cohort, offset) rollup reuses the reduced rows. At 100 TB the
    user-partition window is the same shape as w1/w5; no fact re-scan."""
    t = load_tables(spark, sf_dir, ("events",))
    e = t["events"].select("user_id", F.to_date("ts").alias("d"))
    c = e.withColumn(
        "cohort_dt", F.min("d").over(W.partitionBy("user_id"))
    )
    return c.groupBy(
        "cohort_dt",
        F.datediff(F.col("d"), F.col("cohort_dt")).cast("bigint")
        .alias("day_offset"),
    ).agg(F.countDistinct("user_id").alias("n_users"))


@query(
    "w10_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type AS src,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY event_id) AS dst
      FROM events
    ), pairs AS (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2
    )
    SELECT src, dst, n,
           n * 1.0 / SUM(n) OVER (PARTITION BY src) AS p_next
    FROM pairs
    """,
)
def w10_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event transition matrix P(next | current) per user journey —
    the path-analysis / Markov-funnel building block (which step
    follows which, and with what probability). Ordering inside each
    user is by event_id (the fixture's arrival order), sidestepping
    the parquet ns-vs-µs timestamp comparison hazard the same way
    w6_lag_lead does.

    Scale shape: ONE window shuffle partitioned by user (per-user
    partitions are small), then a map-combined (src, dst) count —
    type² rows at most — and the normalizing share is a window over
    that tiny table. The division is a single IEEE op over exact
    bigints: engine-identical with no rounding.
    """
    t = load_tables(spark, sf_dir, ("events",))
    w = W.partitionBy("user_id").orderBy("event_id")
    seq = t["events"].select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    pairs = (
        seq.filter(F.col("dst").isNotNull())
        .groupBy("src", "dst").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    from pyspark.sql import Window as W2
    share = F.col("n") / F.sum("n").over(W2.partitionBy("src"))
    return pairs.select("src", "dst", "n", share.alias("p_next"))


@query(
    "w11_trailing_range_window",
    oracle="""
    WITH d AS (
      SELECT o_orderkey, o_custkey,
             epoch_us(o_orderdate) // 86400000000 AS day,
             CAST(o_totalprice AS DECIMAL(38,2)) AS dec
      FROM orders
    )
    SELECT o_orderkey, o_custkey, CAST(day AS BIGINT) AS day,
           CAST(SUM(dec) OVER w AS DOUBLE) AS spend_90d,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_90d
    FROM d
    WINDOW w AS (PARTITION BY o_custkey ORDER BY day
                 RANGE BETWEEN 89 PRECEDING AND CURRENT ROW)
    """,
)
def w11_trailing_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 stretch — bounded VALUE-RANGE frame: each order's trailing
    90-day spend and order count per customer (`RANGE BETWEEN 89
    PRECEDING AND CURRENT ROW` over an integer day index). The one
    frame family w7 left uncovered: ROWS frames count rows, this one
    slides on the ORDER BY *value*, so same-day orders are peers (both
    engines include the full peer group — value frames have no tie
    ambiguity, which is also why no tiebreak column is needed).

    Day index is `unix_micros DIV 86400000000` (the a7 integer-index
    convention — non-negative, so Spark's truncating DIV equals
    DuckDB's flooring //); the sum is exact decimal cast to double
    once.

    Scale shape: ONE Exchange on o_custkey serves both aggregates;
    Spark executes bounded range frames with two monotone cursors per
    partition — O(rows) per partition, no per-row rescan (the
    (currentRow, unboundedFollowing) trap in operators/temporal.py
    does not apply to trailing frames).
    """
    t = load_tables(spark, sf_dir, ("orders",))
    d = t["orders"].select(
        "o_orderkey",
        "o_custkey",
        F.expr("unix_micros(o_orderdate) DIV 86400000000").alias("day"),
        F.col("o_totalprice").cast("decimal(38,2)").alias("dec"),
    )
    w = (
        W.partitionBy("o_custkey").orderBy("day").rangeBetween(-89, 0)
    )
    return d.select(
        "o_orderkey",
        "o_custkey",
        "day",
        F.sum("dec").over(w).cast("double").alias("spend_90d"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_90d"),
    )


@query(
    "w13_windowed_count_distinct",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(DISTINCT event_type) OVER
                  (PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_types_so_far
    FROM events
    """,
)
def w13_windowed_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W13 — running COUNT(DISTINCT) over a window, a form Spark SQL
    rejects outright (`DISTINCT_WINDOW_FUNCTION_UNSUPPORTED`): the
    warehouse rewrite is size(collect_set(...)) over the same frame,
    which this query runs while the oracle runs the NATIVE windowed
    DISTINCT (DuckDB supports it) — a genuine rewrite-equivalence
    pair in the reference's A13/A14 spirit (window capability bar:
    docs/olap.md:82,97). Per-user cumulative
    distinct event types, (time, id)-ordered.

    Scale shape: ONE Exchange on user_id serves the window; the
    collect_set state is bounded by the type-domain cardinality (5
    here; small by construction wherever this rewrite is sane — for
    high-cardinality columns the dense_rank/max two-window rewrite or
    a18's HLL is the right tool instead)."""
    t = load_tables(spark, sf_dir, ("events",))
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")), F.col("event_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return t["events"].select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w))
        .cast("bigint").alias("n_types_so_far"),
    )


@query(
    "w14_locf_ignore_nulls",
    oracle="""
    SELECT event_id, user_id, event_type,
           last_value(CASE WHEN event_type <> 'view' THEN value END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled
    FROM events
    """,
)
def w14_locf_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W14 — IGNORE NULLS forward fill (LOCF), the window-native form
    of sensor/metric gap carrying (t12_gap_fill interpolates a dense
    grid; this carries the last observation in place, the hypertable
    `locf()` primitive). 'view' events play the unobserved rows; the
    fill is the most recent non-view value in (time, id) order, NULL
    until a user's first observation. Spark spells it
    last(col, ignorenulls=True); the oracle uses SQL's
    IGNORE NULLS — same frame, same total order, engine-exact (the
    carried value is bit-identical, no arithmetic happens).

    Window capability bar: docs/olap.md:82,97.

    Scale shape: ONE Exchange on user_id, one Window operator, output
    rows = input rows — linear is the floor."""
    t = load_tables(spark, sf_dir, ("events",))
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")), F.col("event_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    obs = F.when(F.col("event_type") != "view", F.col("value"))
    return t["events"].select(
        "event_id", "user_id", "event_type",
        F.last(obs, ignorenulls=True).over(w).alias("filled"),
    )


@query(
    "w15_exclude_current_row",
    oracle="""
    WITH d AS (
      SELECT o_orderkey, o_custkey,
             CAST(o_totalprice AS DECIMAL(38,2)) AS dec,
             CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n
      FROM orders
    )
    SELECT o_orderkey, o_custkey, n,
           CASE WHEN n > 1 THEN
             ROUND(CAST(SUM(dec) OVER (PARTITION BY o_custkey
                     ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING
                     EXCLUDE CURRENT ROW) AS DOUBLE) / (n - 1), 6)
           END AS peer_mean
    FROM d
    """,
)
def w15_exclude_current_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W15 — frame EXCLUDE CURRENT ROW (leave-one-out peer mean: each
    order vs the mean of the customer's OTHER orders — the peer
    benchmark / anomaly baseline that must not include the row being
    judged). DuckDB runs the NATIVE SQL:2011 EXCLUDE clause; Spark
    has no EXCLUDE, so this runs the rewrite (whole-partition decimal
    sum minus self, over n−1) — another genuine rewrite-equivalence
    pair (window capability bar: docs/olap.md:82,97). Singleton
    partitions emit NULL in both engines (guarded division). Decimal
    sums make the excluded total order-independent; the one IEEE
    division is identical, rounded at 6 by convention.

    Scale shape: ONE Exchange on the partition key; both the count
    and the full-frame sum evaluate in a single Window operator."""
    w = W.partitionBy("o_custkey")
    t = load_tables(spark, sf_dir, ("orders",))
    d = t["orders"].select(
        "o_orderkey", "o_custkey",
        F.col("o_totalprice").cast("decimal(38,2)").alias("dec"),
    ).withColumn("n", F.count(F.lit(1)).over(w).cast("bigint"))
    peer = F.when(
        F.col("n") > 1,
        F.round(
            (F.sum("dec").over(w) - F.col("dec")).cast("double")
            / (F.col("n") - 1),
            6,
        ),
    )
    return d.select("o_orderkey", "o_custkey", "n",
                    peer.alias("peer_mean"))
