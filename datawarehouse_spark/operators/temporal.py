"""Temporal join operators.

As-of (most-recent-prior) join — the classic time-series operator Spark
lacks natively (reference analog: the attribution interval join,
docs/实时数仓.md; kdb/pandas `merge_asof` semantics).

The naive form is a range join (key equality + rt <= lt, then keep the
max rt per left row): O(candidate pairs) shuffle fan-out, quadratic in
per-key density. The implementation here is the scalable union-window
form: tag right rows 0 and left rows 1, union, and resolve each left
row's match with ``last(value, ignorenulls=True)`` over a
(key)-partitioned (time, tag)-ordered window — ONE shuffle on the key,
zero pair fan-out, identical result. At equal timestamps the right row
sorts first (tag 0 < 1), giving inclusive `rt <= lt` semantics — the
same as DuckDB ``ASOF JOIN ... ON l.k = r.k AND l.t >= r.t``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
) -> DataFrame:
    """Left as-of join: each left row gains the right row's value
    columns from the most recent right row with
    ``right_time <= left_time`` on the same key (NULLs when no prior
    right row exists — left-join semantics).

    ``right`` must be reduced to one row per (key, time) beforehand
    (otherwise "the most recent row" is ambiguous in any engine); its
    non-key columns — including ``right_time`` itself, so the caller
    sees WHEN the match happened — become the attached value columns.
    Both time columns must share a comparable type (use unix micros for
    event times — see the registry's ts conventions).
    """
    rvals = [c for c in right.columns if c != on]
    ltypes = dict(left.dtypes)
    rtypes = dict(right.dtypes)
    lcols = [c for c in left.columns if c != on]

    # the union-window plan tags rows and interleaves both schemas, so
    # shared non-key names or reserved tags would silently collide —
    # fail loudly instead (mirrors salted_join's mode guard)
    overlap = set(lcols) & set(rvals)
    if overlap:
        raise ValueError(
            f"asof_join: non-key column names must be disjoint; both "
            f"sides have {sorted(overlap)} — rename one side first"
        )
    reserved = {"_t", "_tag"} & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(
            f"asof_join: column names {sorted(reserved)} are reserved "
            "for internal tagging; rename them first"
        )

    # the right row travels as ONE struct, non-null exactly on right
    # rows: per-column last(ignorenulls) would skip a matched right
    # row whose individual value is NULL and stitch together columns
    # from DIFFERENT right rows — the struct keeps the match atomic
    # (a matched row with NULL members stays the match, as in DuckDB
    # ASOF / pandas merge_asof)
    rv_schema = ",".join(f"`{c}`:{rtypes[c]}" for c in rvals)
    r = right.select(
        on,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols],
        F.struct(*rvals).alias("_rv"),
    )
    l = left.select(
        on,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_tag"),
        *lcols,
        F.lit(None).cast(f"struct<{rv_schema}>").alias("_rv"),
    )
    merged = r.unionByName(l)
    w = (
        W.partitionBy(on)
        .orderBy("_t", "_tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    resolved = merged.select(
        on,
        "_tag",
        *lcols,
        F.last("_rv", ignorenulls=True).over(w).alias("_rv"),
    )
    return (
        resolved.filter(F.col("_tag") == 1)
        .select(
            on, *lcols,
            *[F.col("_rv").getField(c).alias(c) for c in rvals],
        )
    )
