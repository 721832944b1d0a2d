"""Distributed global-order primitives — the shared machinery behind
every operator that needs a GLOBAL rank / running total / quantile
bucket without funnelling the table through one partition's window
(the reference's "数据倾斜" sort pathology, docs/sql调优.md:115-186;
Spark plans a global `Window` as Sort over `Exchange SinglePartition`,
which is a one-task bottleneck at any real scale).

The pattern (zipWithIndex re-expressed on DataFrames):

1. ``repartitionByRange`` on the sort key → a partition-wise total
   order. Sampled range boundaries make the per-partition SPLIT
   nondeterministic, so the composite sort key must be UNIQUE — then
   the global order (and everything derived from it) is invariant to
   where the boundaries fall.
2. per-block ``row_number`` — embarrassingly parallel.
3. an ``n_blocks``-row block-count table lifted to cumulative offsets
   by a TRIANGULAR self-join (sum of strictly-earlier blocks) — tiny
   by construction, broadcast back. No window with an empty partition
   spec anywhere, so the `global-window` plan lint
   (plans/advisor.py) stays silent registry-wide.

``n_blocks`` defaults to the SESSION's configured shuffle parallelism
(resolve_n_blocks): on local[32] that is 32 range blocks; on a
1000-executor cluster whatever ``spark.sql.shuffle.partitions`` says —
the per-block sort is as parallel as every other shuffle in the job
instead of a fixed 8-way fan. The triangular offset join is
n_blocks², so the resolver caps at 4096 (≤16.7M joined rows — still a
broadcast-sized offset table; at 100 TB that is ~25 GB per block
through a spillable per-partition sort, and the escape hatch is
passing an explicit larger ``n_blocks`` once a two-level offset lift
is warranted).

Callers: x5_rfm_segmentation (exact NTILE quintiles), x8_abc_pareto
(global_cumsum), dq_equiheight_histogram (operators/layout.py),
sorted_neighborhood_pairs (operators/dedup.py), curriculum_phases
(operators/text.py), shard_pack (operators/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

#: Ceiling for the auto-sized block count: keeps the triangular
#: offset self-join ≤ 4096² ≈ 16.7M rows (sub-second, broadcastable)
#: while leaving per-block sorts spillable at any realistic scale.
MAX_AUTO_BLOCKS = 4096

#: Internal working columns — global_rank/global_cumsum refuse input
#: frames that already carry one of these (a silent withColumn
#: overwrite + drop would corrupt caller data without error).
_INTERNAL_COLS = ("_blk", "_rn", "_off", "_cum_in", "_mid")


def resolve_n_blocks(df: DataFrame, n_blocks: int | None = None) -> int:
    """The block count for a global-order pass: the caller's explicit
    choice, else the session's configured shuffle parallelism
    (``spark.sql.shuffle.partitions``, which session.get_spark sizes
    to the core count locally and recommend_shuffle_partitions sizes
    from input volume on a cluster), capped at MAX_AUTO_BLOCKS so the
    triangular offset join stays trivial."""
    if n_blocks is not None:
        if int(n_blocks) < 1:
            raise ValueError(f"n_blocks must be >= 1, got {n_blocks}")
        return int(n_blocks)
    spark = df.sparkSession
    try:
        conf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:  # non-numeric / locked-down conf
        conf = spark.sparkContext.defaultParallelism
    return max(1, min(int(conf), MAX_AUTO_BLOCKS))


def _guard_internal_collisions(df: DataFrame, caller: str) -> None:
    clash = [c for c in _INTERNAL_COLS if c in df.columns]
    if clash:
        raise ValueError(
            f"{caller}: input columns {clash} collide with internal "
            f"working names {_INTERNAL_COLS}; rename them first"
        )


def block_offsets(
    cnt: DataFrame,
    blk: str = "_blk",
    c: str = "_c",
    off_col: str = "_off",
    total_col: str | None = None,
) -> DataFrame:
    """Cumulative EXCLUSIVE prefix sums over a block-count table —
    (blk, off) where off = Σ counts of strictly-smaller blocks — via a
    triangular left self-join instead of a global running-sum window.
    The input is n_blocks rows by construction, so the O(n_blocks²)
    join is trivial and the output broadcasts. With ``total_col`` the
    grand total (Σ all counts) rides along on every row, replacing the
    unbounded-following window variant. Sums keep the count column's
    own exact type (bigint counts stay bigint; decimal byte/revenue
    totals stay decimal — global_cumsum relies on this)."""
    a = cnt.select(F.col(blk).alias("_ra"))
    b = cnt.select(F.col(blk).alias("_rb"), F.col(c).alias("_cb"))
    off = (
        a.join(b, F.col("_rb") < F.col("_ra"), "left")
        .groupBy("_ra")
        .agg(F.coalesce(F.sum("_cb"), F.lit(0)).alias(off_col))
        .withColumnRenamed("_ra", blk)
    )
    if total_col is not None:
        tot = cnt.agg(F.sum(c).alias(total_col))
        off = off.crossJoin(F.broadcast(tot))
    return off


def global_rank(
    df: DataFrame,
    order: list[Column],
    n_blocks: int | None = None,
    rank_col: str = "grn",
    total_col: str | None = None,
) -> DataFrame:
    """Attach the exact 1-based GLOBAL rank of every row under
    ``order`` (which must be a total order — include a unique tiebreak
    column) without a single-partition sort. Optionally also attaches
    the total row count (``total_col``) so rank-derived bucketings
    (NTILE, equi-height cuts) need no second pass. ``n_blocks`` is
    auto-sized from the session's shuffle parallelism when omitted
    (resolve_n_blocks).

    ONE shuffle total: the per-block row number comes from
    ``monotonically_increasing_id`` over a ``sortWithinPartitions``'d
    range shuffle (the id packs the partition index in the high 31
    bits and an in-partition row counter — assigned in sorted flow
    order — in the low 33 bits: the zipWithIndex recipe). The naive
    ``row_number OVER (PARTITION BY block)`` alternative plans a
    SECOND full-table hash exchange, because Catalyst cannot know the
    block column IS the partition id. The id expression is
    nondeterministic, which also pins it above the sort.

    The ranked frame is eagerly localCheckpoint'ed: the range shuffle
    + sort run ONCE, both consumers (the block counts and the output
    join) read the materialized blocks, and the checkpoint pins the
    sampled range boundaries so the two reads cannot disagree. The
    checkpoint's lifetime is tied to the returned DataFrame (no
    persist/unpersist pair to leak), and it keeps all ``n_blocks``
    partitions — the downstream broadcast join adds no exchange, so
    consumers inherit the full parallelism."""
    _guard_internal_collisions(df, "global_rank")
    nb = resolve_n_blocks(df, n_blocks)
    local = (
        df.repartitionByRange(nb, *order)
        .sortWithinPartitions(*order)
        .withColumn("_mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
        .withColumn("_blk", F.shiftright("_mid", 33).cast("int"))
        .withColumn(
            "_rn",
            F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1)) + F.lit(1),
        )
    )
    cnt = local.groupBy("_blk").agg(F.count(F.lit(1)).alias("_c"))
    off = block_offsets(cnt, "_blk", "_c", total_col=total_col)
    return (
        local.join(F.broadcast(off), "_blk")
        .withColumn(rank_col, (F.col("_rn") + F.col("_off")).cast("bigint"))
        .drop("_blk", "_rn", "_off", "_mid")
    )


def global_cumsum(
    df: DataFrame,
    order: list[Column],
    value: str,
    n_blocks: int | None = None,
    cum_col: str = "cum",
    total_col: str | None = None,
) -> DataFrame:
    """Attach the INCLUSIVE global running sum of ``value`` under
    ``order`` (which must be a total order) without a single-partition
    sort — the `SUM(v) OVER (ORDER BY ...)` re-expression: per-block
    running sums lifted by the broadcast triangular-join offsets of
    per-block totals (the shard_pack byte-packing machinery,
    generalized). ``value`` should be an exact type (bigint/decimal)
    so block composition cannot reorder float additions. Optionally
    attaches the grand total (``total_col``) for share-of-total
    projections. ``n_blocks`` auto-sizes from the session's shuffle
    parallelism when omitted (resolve_n_blocks)."""
    _guard_internal_collisions(df, "global_cumsum")
    nb = resolve_n_blocks(df, n_blocks)
    ranged = df.repartitionByRange(nb, *order).withColumn(
        "_blk", F.spark_partition_id()
    )
    w_cum = (
        W.partitionBy("_blk")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    local = ranged.withColumn(
        "_cum_in", F.sum(F.col(value)).over(w_cum)
    ).localCheckpoint(eager=True)
    tot = local.groupBy("_blk").agg(F.sum(F.col(value)).alias("_c"))
    off = block_offsets(tot, "_blk", "_c", total_col=total_col)
    return (
        local.join(F.broadcast(off), "_blk")
        .withColumn(cum_col, F.col("_off") + F.col("_cum_in"))
        .drop("_blk", "_cum_in", "_off")
    )


def ntile_from_rank(rank_col: str, total_col: str, n: int) -> Column:
    """Exact SQL NTILE(n) bucket from a global rank and total count:
    with q = N div n and r = N mod n, the first r buckets hold q+1
    rows and the rest hold q (the ANSI NTILE contract, which
    approx-percentile bucketing only approximates). Integer-only, so
    the result is bit-identical to the engine's own ntile() and any
    oracle's — without the single-partition window ntile() plans."""
    if n < 1:
        raise ValueError(f"ntile_from_rank needs n >= 1, got {n}")
    q = f"({total_col} div {int(n)})"
    r = f"({total_col} % {int(n)})"
    head = f"{r} * ({q} + 1)"  # rows living in the (q+1)-sized buckets
    return F.expr(
        f"CASE WHEN {rank_col} <= {head} "
        f"THEN ({rank_col} - 1) div ({q} + 1) + 1 "
        f"ELSE {r} + ({rank_col} - {head} - 1) div {q} + 1 END"
    ).cast("bigint")
