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
    return _x4_rule_from_profile(user_profile(t["events"]))


def _x4_rule_from_profile(prof: DataFrame) -> DataFrame:
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
    return _x4_scores_from_profile(user_profile(t["events"]))


def _x4_scores_from_profile(prof: DataFrame) -> DataFrame:
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


@query(
    "x6_session_paths",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessioned AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    ), paths AS (
      SELECT user_id, sid,
             string_agg(substr(event_type, 1, 1), ''
                        ORDER BY epoch_us(ts), event_id) AS path
      FROM sessioned GROUP BY 1, 2
    ), agg AS (
      SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
      FROM paths GROUP BY 1
    )
    SELECT path, n_sessions, rank FROM (
      SELECT path, n_sessions,
             CAST(row_number() OVER (ORDER BY n_sessions DESC, path)
                  AS BIGINT) AS rank
      FROM agg
    ) WHERE rank <= 20
    """,
)
def x6_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey path analysis (用户路径分析 — the classic ADS-layer
    behavioral report): sessionize the event stream (30-minute
    inactivity gap, the t5 session operator), reduce each session to
    its ordered event-type-initial string, and report the top-20 most
    common session paths — what product analytics reads to see "where
    do users actually go".

    Exactness: session boundaries are the t5-proven session_window ≡
    lag+cumsum equivalence; within-session order is total
    (µs timestamp, event_id tiebreak); top-k orders on
    (count desc, path).

    Scale shape: ONE shuffle on user_id sessionizes (session state is
    bounded by the behavioral gap), paths build in-row (array_sort of
    collected per-session structs), the path frequency table is one
    map-combined count (distinct paths ≪ sessions), and top-k plans
    as TakeOrdered with the rank window over the 20-row result. The
    per-session path transform also runs UNBOUNDED
    (streaming/core.py::session_paths — watermarked session windows;
    stream≡batch replay parity in
    tests/test_streaming.py::test_session_paths_stream_equals_batch).
    """
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ("events",))
    paths = (
        t["events"]
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.unix_micros("ts").alias("ts_us"),
                                F.col("event_id"),
                                F.substring("event_type", 1, 1).alias("i"),
                            )
                        )
                    ),
                    lambda x: x["i"],
                ),
                "",
            ).alias("path")
        )
    )
    agg = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )
    top = agg.orderBy(F.desc("n_sessions"), F.asc("path")).limit(20)
    return top.withColumn(
        "rank",
        F.row_number()
        .over(W.orderBy(F.desc("n_sessions"), F.asc("path")))
        .cast("bigint"),
    )


@query(
    "x7_churn_detection",
    oracle="""
    WITH before_d AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events_before,
             CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_seen_us
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-11'
      GROUP BY 1
    ), after_d AS (
      SELECT DISTINCT user_id FROM events
      WHERE ts >= TIMESTAMP '2024-01-11' AND ts < TIMESTAMP '2024-01-12'
    )
    SELECT b.user_id, b.n_events_before, b.last_seen_us
    FROM before_d b
    WHERE NOT EXISTS (SELECT 1 FROM after_d a WHERE a.user_id = b.user_id)
    """,
)
def x7_churn_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-active-user lapse — the retention complement of the w9
    cohort matrix: users active on the observation day (Jan 10) with
    ZERO activity the next day, with their prior volume and last-seen
    time — the ADS-layer feed of every win-back campaign. (Day
    granularity because the synthetic stream is dense: at week
    granularity every fixture user stays active and the report is
    vacuously empty.)

    Scale shape: two pushdown-pruned scans (the ts range reaches the
    parquet scan), one map-combined per-user aggregate, one
    LEFT ANTI join on user_id — no windows, no skew risk beyond the
    user key itself (a hot user is one row after the aggregate).
    """
    t = load_tables(spark, sf_dir, ("events",))
    ev = t["events"]
    before = (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-11").cast("timestamp"))
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events_before"),
            F.max(F.unix_micros("ts")).cast("bigint").alias("last_seen_us"),
        )
    )
    after = ev.filter(
        (F.col("ts") >= F.lit("2024-01-11").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-12").cast("timestamp"))
    ).select("user_id")
    return before.join(after, "user_id", "left_anti")


@query(
    "x8_abc_analysis",
    oracle="""
    WITH base AS (
      SELECT o_custkey AS custkey,
             SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS rev
      FROM orders GROUP BY 1
    ), c AS (
      SELECT custkey, rev,
             SUM(rev) OVER (ORDER BY rev DESC, custkey
                            ROWS UNBOUNDED PRECEDING) AS cum_rev,
             SUM(rev) OVER () AS tot
      FROM base
    )
    SELECT custkey,
           CAST(rev AS DOUBLE) AS rev,
           round(CAST(cum_rev AS DOUBLE) / CAST(tot AS DOUBLE), 6)
             AS cum_share,
           CASE WHEN CAST(cum_rev AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.8
                  THEN 'A'
                WHEN CAST(cum_rev AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.95
                  THEN 'B'
                ELSE 'C' END AS abc
    FROM c
    """,
)
def x8_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto analysis — rank customers by revenue and classify
    by INCLUSIVE cumulative revenue share (A ≤ 80%, B ≤ 95%, C the
    tail): the classic "which 20% of customers drive 80% of revenue"
    warehouse report, and the global-running-sum sibling of the RFM
    quintiles.

    Exactness: revenue stays decimal through the per-customer rollup,
    the distributed running sum and the grand total; the share is one
    IEEE division of exact decimals cast to double — class boundaries
    compare that identical double in both engines, so bucket edges
    can never disagree.

    Scale shape: the classic SUM(rev) OVER (ORDER BY rev DESC)
    formulation single-partitions the customer rollup; this runs the
    distributed global cumsum instead (operators/rank.py::
    global_cumsum — one range shuffle, per-block running sums, a
    broadcast triangular-join block-offset lift), with the grand
    total riding along as a broadcast scalar. Fully parallel at any
    customer count.
    """
    from datawarehouse_spark.operators.rank import global_cumsum

    t = load_tables(spark, sf_dir, ("orders",))
    base = t["orders"].groupBy(
        F.col("o_custkey").alias("custkey")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,2)")).alias("rev")
    )
    cum = global_cumsum(
        base,
        [F.desc("rev"), F.asc("custkey")],
        "rev",
        cum_col="cum_rev",
        total_col="_tot",
    )
    share = F.col("cum_rev").cast("double") / F.col("_tot").cast("double")
    return cum.select(
        "custkey",
        F.col("rev").cast("double").alias("rev"),
        F.round(share, 6).alias("cum_share"),
        F.when(share <= 0.8, "A")
        .when(share <= 0.95, "B")
        .otherwise("C")
        .alias("abc"),
    )


def fused_reshape_profiles(
    spark: SparkSession, sf_dir: str
) -> dict[str, DataFrame]:
    """suite_reshape_profiles: two member pairs rebuild the same
    users-sized rollup per suite run — x3_pivot/x3_unpivot both pivot
    the events fact into the wide tag table (the unpivot member calls
    the pivot internally), and the two X4 tag members both aggregate
    the identical per-user (pv, purchases, purchase_amt) profile.
    Compute each rollup once (eagerly materialized inside the timed
    suite call; nothing survives the run) and feed both consumers —
    guide §2.4. Both intermediates are bounded by user count, never
    fact volume, so pinning them beats re-scanning the fact at any
    scale. Member rows are bit-identical (same member code, prebuilt
    input injected), pinned by test_fused_suites_match_members."""
    from datawarehouse_spark.queries.warehouse import (
        _x3_unpivot_from_wide,
        _x3_wide,
    )

    t = load_tables(spark, sf_dir, ("events",))
    wide = _x3_wide(t["events"]).localCheckpoint(eager=True)
    prof = user_profile(t["events"]).localCheckpoint(eager=True)
    return {
        "x3_pivot_wide_tags": wide,
        "x3_unpivot_narrow_tags": _x3_unpivot_from_wide(wide),
        "x4_rule_tag_profile": _x4_rule_from_profile(prof),
        "x4_mining_tag_scores": _x4_scores_from_profile(prof),
    }
