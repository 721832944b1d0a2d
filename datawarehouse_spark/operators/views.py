"""Incremental materialized-view maintenance.

The classic warehouse fast path: a periodically-refreshed aggregate
view is updated from a DELTA batch by merging partial-aggregate state,
never re-scanning the base facts (reference scope: the nightly-rollup
tables described in /root/reference/docs/离线数仓.md — the refresh
there is a full recompute; the incremental form is the 100 TB-scale
replacement). Works for any algebraic aggregate whose state is
mergeable — SUM/COUNT by addition, MIN/MAX by least/greatest, AVG as
SUM+COUNT merged then divided at presentation.

Exactness: the view must carry SUM state in exact ``decimal`` (the
repo-wide dsum convention), not double — decimal addition is
associative, so ``merge(agg(base), agg(delta)) == agg(base ∪ delta)``
bit-for-bit and the driver oracle can be the FULL RECOMPUTE. A view
holding double sums would drift from the recompute by float
reassociation, which is exactly the bug this module's test pins.

Scale shape: the merge is ONE full-outer shuffle on the group keys of
two view-sized (not fact-sized) tables; a refresh touches
O(|delta| + |view|) rows. At 100 TB the delta agg is a partial
(map-combined) aggregation of the new partition only — the base facts
are never read after the first materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: column -> merge rule
MERGE_RULES = ("sum", "count", "min", "max")


def incremental_agg_merge(
    view: DataFrame,
    delta: DataFrame,
    keys: list[str],
    merge: dict[str, str],
) -> DataFrame:
    """Merge a delta partial-aggregate into the materialized view.

    ``view`` and ``delta`` share the schema ``keys + merge.keys()``;
    ``merge`` maps each state column to its rule: ``sum``/``count``
    (null-safe addition), ``min``/``max`` (Spark least/greatest skip
    nulls). Returns the refreshed view with the same schema — the
    output is itself valid input for the next refresh cycle.
    """
    for col, rule in merge.items():
        if rule not in MERGE_RULES:
            raise ValueError(f"unknown merge rule {rule!r} for {col!r}")
    v, d = view.alias("v"), delta.alias("d")
    out = [F.col(k) for k in keys]  # full-outer on the name list coalesces keys
    for col, rule in merge.items():
        a, b = F.col(f"v.{col}"), F.col(f"d.{col}")
        if rule in ("sum", "count"):
            zero = F.lit(0).cast(dict(view.dtypes)[col])
            expr = F.coalesce(a, zero) + F.coalesce(b, zero)
            # decimal addition widens the type (38,s)+(38,s)->(38,s) is
            # capped at 38 digits; cast back so the view schema is a
            # fixed point across refresh cycles
            expr = expr.cast(dict(view.dtypes)[col])
        elif rule == "min":
            expr = F.least(a, b)
        else:
            expr = F.greatest(a, b)
        out.append(expr.alias(col))
    return v.join(d, on=keys, how="full_outer").select(*out)
