"""Programmatic logical rewrites — SURVEY §4.1's "candidate custom
rule", expressed as builder-level transformations rather than a
Catalyst extension (Catalyst rules need JVM code; the rewrite itself
is a plan construction, so applying it while BUILDING the plan gives
the identical physical result).

The one rewrite Catalyst lacks (`RemoveRedundantAggregates` handles
direct nesting, not across UNION ALL branches — SURVEY §4.1) is the
reference's multi-pass→single-pass aggregation collapse
(docs/sql调优.md:73-91): N filtered aggregations of the SAME source
UNION ALLed together re-scan the fact table N times; the collapsed
form tags each row with the branches it satisfies and aggregates once.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def union_aggs_single_scan(
    df: DataFrame,
    branches: Mapping[str, Column],
    group_cols: Sequence[str],
    aggs: Sequence[Column],
    tag_col: str = "branch",
) -> DataFrame:
    """Collapse ``UNION ALL`` of N same-source filtered aggregations
    into ONE scan (docs/sql调优.md:73-91 in the reference knowledge
    base).

    Naive form (N scans + N shuffles of the same fact table)::

        SELECT 'b1' tag, k, agg FROM t WHERE p1 GROUP BY k
        UNION ALL
        SELECT 'b2' tag, k, agg FROM t WHERE p2 GROUP BY k ...

    Rewritten form (one scan, one shuffle): each row emits the set of
    branch tags whose predicate it satisfies (``array_compact`` drops
    the non-matching NULL slots), explodes that tag set — average
    fan-out = the mean number of branches a row matches, ≤ N and
    typically ≈ 1 — and aggregates once on (tag, keys). At 100 TB the
    difference is N full scans of the fact table vs one.

    Semantics are identical for any per-branch-row-determined
    aggregate (sum/count/min/max/avg over the branch's rows) because
    each exploded copy belongs to exactly one branch. Branch order in
    ``branches`` is not significant; a row matching no branch
    contributes nothing (as in the naive form).
    """
    if not branches:
        raise ValueError("need at least one branch predicate")
    tags = F.array_compact(
        F.array(
            *[F.when(pred, F.lit(name)) for name, pred in branches.items()]
        )
    )
    return (
        df.withColumn(tag_col, F.explode(tags))
        .groupBy(tag_col, *group_cols)
        .agg(*aggs)
    )
