"""Skew diagnosis & mitigation utilities — SURVEY.md §2.3 J5/J6, §2.4
A11/A15 (reference docs/sql调优.md:126-259, the 7 solutions).

AQE (enabled in the session profile) subsumes the runtime split/salt
recipes for joins; these helpers cover diagnosis (hot-key profiling,
solution 0) and the manual salting forms for extreme cases AQE can't
see (aggregation skew, deliberate pre-salting before reuse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_distribution(df: DataFrame, *keys: str, top: int = 20) -> DataFrame:
    """A15 — hot-key profile (reference `countByKey` + sample,
    docs/sql调优.md:29-36): top keys with counts and share.

    Single-pass: the grand total is a scalar re-aggregation of the same
    per-key counts, cross-joined back (broadcast of one row). Both
    branches hang off an identical Exchange, so ReuseExchange scans and
    pre-aggregates the fact table once — no driver-side ``count()``
    blocking a second full scan."""
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.col("cnt") / F.col("_total"))
        .drop("_total")
        .orderBy(F.desc("cnt"))
        .limit(top)
    )


def skew_ratio(df: DataFrame, *keys: str) -> float:
    """max(partition-key count) / mean — the reference's skew symptom
    quantified (997/1000 tasks fast, docs/sql调优.md:4)."""
    stats = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.max("cnt").alias("mx"), F.avg("cnt").alias("mean"))
        .first()
    )
    return float(stats["mx"]) / float(stats["mean"]) if stats["mean"] else 1.0


def salted_join(big: DataFrame, small: DataFrame, key: str, n_salt: int = 8,
                how: str = "inner") -> DataFrame:
    """J5/J6 — deterministic-salt join: big side salted by row hash,
    small side exploded ×n_salt (reference solution 7,
    docs/sql调优.md:234-250). Result is identical to the plain join —
    which holds only for inner/left/left_semi: with right/full, an
    unmatched small-side row would surface once per salt replica, so
    those modes are rejected rather than silently wrong."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "semi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi, not {how!r}: the "
            "×n_salt-exploded small side would emit unmatched rows n_salt "
            "times under right/full join modes"
        )
    b = big.withColumn("_salt", F.pmod(F.xxhash64(*big.columns), F.lit(n_salt)))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0).cast("long"), F.lit(n_salt - 1)))
    )
    return b.join(s, [key, "_salt"], how).drop("_salt")


def split_skew_join(
    big: DataFrame,
    small: DataFrame,
    key_big: str,
    key_small: str,
    hot_threshold: int,
    n_salt: int = 8,
) -> DataFrame:
    """J5 — the reference's 6-step split-skew-join recipe
    (docs/sql调优.md:202-232): profile the big side's key counts, peel
    off keys above ``hot_threshold`` into a salted join (small side
    replicated ×n_salt), join the cold remainder plainly, union.

    Semantically identical to the plain inner join — the salt cancels.
    Scale note: the hot-key list is tiny by construction (it's the
    skew), so both semi/anti splits broadcast it; only the hot slice
    pays the ×n_salt replication, unlike full-expansion salting (J6)
    which replicates the whole small side.
    """
    if key_big == key_small:
        raise ValueError(
            f"split_skew_join: key_big and key_small are both "
            f"'{key_big}' — F.col('{key_big}') == F.col('{key_big}') is "
            "ambiguous across the two sides; rename one side's key "
            "first (mirrors salted_join's loud mode guard)"
        )
    hot = (
        big.groupBy(key_big)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .filter(F.col("_cnt") > hot_threshold)
        .select(key_big)
    )
    hot_b = F.broadcast(hot)
    hot_s = F.broadcast(hot.withColumnRenamed(key_big, key_small))
    cond = F.col(key_big) == F.col(key_small)

    big_hot = big.join(hot_b, key_big, "left_semi")
    big_cold = big.join(hot_b, key_big, "left_anti")
    small_hot = small.join(hot_s, key_small, "left_semi")
    small_cold = small.join(hot_s, key_small, "left_anti")

    bh = big_hot.withColumn(
        "_salt", F.pmod(F.xxhash64(*big.columns), F.lit(n_salt))
    )
    sh = small_hot.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(n_salt - 1))),
    )
    joined_hot = bh.join(sh, cond & (bh["_salt"] == sh["_salt"])).select(
        [bh[c] for c in big.columns] + [sh[c] for c in small.columns]
    )
    joined_cold = big_cold.join(small_cold, cond)
    return joined_hot.unionByName(joined_cold)


def salted_agg(df: DataFrame, group_cols: list[str], agg_exprs: dict,
               n_salt: int = 16) -> DataFrame:
    """A11 — two-phase salted aggregation (reference solution 6,
    docs/sql调优.md:173-186) for hot group keys.

    ``agg_exprs``: {output_name: ("sum"|"count", column)}. Partials are
    decimal-exact so the two-phase sum equals the single-phase one.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*df.columns), F.lit(n_salt))
    )
    partials = []
    finals = []
    for name, (kind, col) in agg_exprs.items():
        if kind == "count":
            partials.append(F.count(F.lit(1) if col == "*" else F.col(col)).alias(f"_p_{name}"))
            finals.append(F.sum(f"_p_{name}").alias(name))
        elif kind == "sum":
            partials.append(
                F.sum(F.col(col).cast("decimal(38,2)")).alias(f"_p_{name}")
            )
            finals.append(F.sum(f"_p_{name}").cast("double").alias(name))
        else:
            raise ValueError(f"unsupported agg kind: {kind}")
    phase1 = salted.groupBy(*group_cols, "_salt").agg(*partials)
    return phase1.groupBy(*group_cols).agg(*finals)

def column_profile(df: DataFrame, numeric: list[str],
                   strings: list[str]) -> DataFrame:
    """Table profiling — the warehouse ``ANALYZE TABLE`` statistics as
    a query result: per column, row count, null count, exact distinct
    count, and min/max (numeric columns in ``min_num/max_num`` rounded
    to 6, string columns in ``min_str/max_str``; the other pair is
    NULL). Long-form output ``(col_name, n, n_null, n_distinct,
    min_num, max_num, min_str, max_str)`` — what an optimizer's stats
    collector, a DQ monitor, or a migration diff consumes.

    Scale shape (r15 rewrite, guide §2.3): one independent
    single-column aggregation per profiled column, unioned — the
    count_distinct_split discipline applied to the profiler itself.
    The former one-pass form planned the N distinct aggregates via
    Expand (every input row copied once PER distinct column before
    the partial aggregate — N× the rows through the first stage) and
    its 25-aggregate codegen unit alone cost ~1 s of compile; measured
    at sf0.1 the expand form ran 2.6-3.4 s where this one runs 1.4 s.
    On columnar storage the N single-column scans read exactly the
    same bytes as one N-column scan, each subtree shuffles only its
    own distinct values (never expanded copies), and AQE runs the
    independent subtrees' stages concurrently. Values are identical:
    same count/sum-null/count-distinct/min/max per column, same
    rounding, same output rows.
    """
    parts = []
    for c in numeric + strings:
        is_num = c in numeric
        one = df.select(c).agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col(c).isNull().cast("bigint")).alias("_nn"),
            F.count_distinct(F.col(c)).alias("_nd"),
            F.min(c).alias("_mn"),
            F.max(c).alias("_mx"),
        )
        parts.append(one.select(
            F.lit(c).alias("col_name"),
            F.col("_n").cast("bigint").alias("n"),
            F.col("_nn").cast("bigint").alias("n_null"),
            F.col("_nd").cast("bigint").alias("n_distinct"),
            (F.round(F.col("_mn").cast("double"), 6) if is_num
             else F.lit(None).cast("double")).alias("min_num"),
            (F.round(F.col("_mx").cast("double"), 6) if is_num
             else F.lit(None).cast("double")).alias("max_num"),
            (F.lit(None).cast("string") if is_num
             else F.col("_mn").cast("string")).alias("min_str"),
            (F.lit(None).cast("string") if is_num
             else F.col("_mx").cast("string")).alias("max_str"),
        ))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out



def count_distinct_split(df: DataFrame, group_cols: list[str],
                         distinct_cols: list[str]) -> DataFrame:
    """Per-distinct split rewrite of a multi-`count(distinct)`
    aggregation — the 100 TB fallback SURVEY §7.3 risk 3 reserves for
    when Spark's single `expand`-based plan (which replicates every
    input row once PER distinct aggregate before the shuffle) becomes
    the bottleneck: N distinct aggregates over a T-row fact shuffle
    N·T expanded rows in one job, where this rewrite runs N
    independent two-level aggregations (dedupe on (keys, col), count)
    and joins the N key-sized results — total shuffle Σ|distinct
    pairs| ≤ N·T with each job's skew/spill isolated, at the cost of
    N scans (cheap on columnar storage: each scan prunes to
    keys + one column).

    NULL semantics match the expand plan exactly: the result has one
    row per distinct GROUP KEY of the input — including the NULL key
    (joined null-safely, so it never splits into per-part rows) and
    groups whose distinct columns are all NULL (anchored by the key
    spine below, counting 0 like count(distinct) does).

    Equality with the expand plan is property-tested
    (tests/test_properties.py, including the all-NULL-values and
    NULL-group-key cases); the measured crossover is recorded in
    SCALE.md — on the fixture blow-up the expand form stays ahead
    until per-row width × N dominates, exactly the regime the
    reference's count-distinct-extraction rewrite (A14) targets.
    """
    from functools import reduce

    # key spine: every group key present in the input, so a group
    # whose distinct columns are all NULL still emits its zero row
    out = df.select(*group_cols).distinct()
    for c in distinct_cols:
        part = (
            df.select(*group_cols, c)
            .where(F.col(c).isNotNull())
            .distinct()
            .groupBy(*group_cols)
            .agg(F.count(F.lit(1)).alias(f"nd_{c}"))
        )
        renamed = part.select(
            *[F.col(g).alias(f"_k_{g}") for g in group_cols], f"nd_{c}"
        )
        # null-safe equi-join (<=> is still a hash-partitionable key):
        # a NULL group key is ONE group, same as in the expand plan
        cond = reduce(
            lambda a, b: a & b,
            [F.col(g).eqNullSafe(F.col(f"_k_{g}")) for g in group_cols],
        )
        out = out.join(renamed, cond, "left").drop(
            *[f"_k_{g}" for g in group_cols]
        )
    fill = [
        F.coalesce(F.col(f"nd_{c}"), F.lit(0)).alias(f"nd_{c}")
        for c in distinct_cols
    ]
    return out.select(*group_cols, *fill)
