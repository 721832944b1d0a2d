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

Callers: x5_rfm_segmentation (exact NTILE quintiles),
dq_equiheight_histogram (operators/layout.py),
sorted_neighborhood_pairs (operators/dedup.py), curriculum_phases
(operators/text.py), shard_pack (operators/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


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
    n_blocks: int = 8,
    rank_col: str = "grn",
    total_col: str | None = None,
) -> DataFrame:
    """Attach the exact 1-based GLOBAL rank of every row under
    ``order`` (which must be a total order — include a unique tiebreak
    column) without a single-partition sort. Optionally also attaches
    the total row count (``total_col``) so rank-derived bucketings
    (NTILE, equi-height cuts) need no second pass.

    The ranked frame is eagerly localCheckpoint'ed: the range shuffle
    + per-block window run ONCE, and both consumers (the block counts
    and the output join) read the materialized blocks — the same
    one-materialization hygiene as sorted_neighborhood_pairs, with the
    checkpoint's lifetime tied to the returned DataFrame (no
    persist/unpersist pair to leak)."""
    ranged = df.repartitionByRange(n_blocks, *order).withColumn(
        "_blk", F.spark_partition_id()
    )
    local = ranged.withColumn(
        "_rn", F.row_number().over(W.partitionBy("_blk").orderBy(*order))
    ).localCheckpoint(eager=True)
    cnt = local.groupBy("_blk").agg(F.count(F.lit(1)).alias("_c"))
    off = block_offsets(cnt, "_blk", "_c", total_col=total_col)
    return (
        local.join(F.broadcast(off), "_blk")
        .withColumn(rank_col, (F.col("_rn") + F.col("_off")).cast("bigint"))
        .drop("_blk", "_rn", "_off")
    )


def global_cumsum(
    df: DataFrame,
    order: list[Column],
    value: str,
    n_blocks: int = 8,
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
    projections."""
    ranged = df.repartitionByRange(n_blocks, *order).withColumn(
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
