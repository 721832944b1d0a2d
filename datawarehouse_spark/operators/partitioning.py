"""Scan-layout helpers shared by the operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_narrow_input(df: DataFrame, per_core: int = 1) -> DataFrame:
    """Round-robin repartition an input whose CURRENT layout has fewer
    partitions than the session's parallelism — the optimization-guide
    §2.5 "input skew" fix for small or unsplittable sources (a
    single-row-group parquet file scans as ONE task, so every
    expensive per-row map — Arrow UDF batches, L-window fingerprints,
    shingle explodes — would otherwise run on one core while the rest
    of the machine idles).

    Scale-adaptive by construction: when the incoming layout is
    already at least core-wide (any real multi-split table — a 100 TB
    corpus scans as thousands of splits), this returns ``df``
    unchanged, so it can never COALESCE a wide layout down to the
    local core count. Round-robin keeps results partitioning-agnostic
    (every caller's downstream op is shuffle/agg-deterministic, and
    Spark's sort-before-repartition default keeps retries exact).

    ``per_core`` widens beyond one partition per core for callers
    whose per-row cost is skewed (longer documents cost more; more,
    smaller partitions smooth the tail).
    """
    target = df.sparkSession.sparkContext.defaultParallelism * per_core
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
