"""Explain-parity reporter — maps Spark physical plan nodes back to the
reference's Hive operator vocabulary (docs/explain.md:36-83) so a plan
can be checked against the reference's annotated EXPLAIN shape.

Hive tree (reference)          Spark physical node
---------------------          -------------------
TableScan                      FileSourceScan / BatchScan
Filter Operator                Filter (or pushed into scan)
Select Operator                Project
Group By (mode: hash)          HashAggregate (partial)
Reduce Output Operator         Exchange hashpartitioning
Group By (mode: mergepartial)  HashAggregate (final)
Map Join                       BroadcastHashJoin + BroadcastExchange
Reduce-side Join               SortMergeJoin / ShuffledHashJoin
File Output / Fetch            results / CollectLimit
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

_NODE_MAP = [
    (r"Scan parquet|FileScan|BatchScan", "TableScan"),
    (r"PushedFilters: \[(?!\])", "TableScan.filterExpr (pushed predicate)"),
    (r"\bFilter\b", "Filter Operator"),
    (r"\bProject\b", "Select Operator"),
    (r"HashAggregate.*(partial|merge)?", "Group By Operator"),
    (r"Exchange hashpartitioning", "Reduce Output Operator (shuffle)"),
    (r"Exchange rangepartitioning", "Reduce Output Operator (global sort)"),
    (r"BroadcastHashJoin|BroadcastNestedLoopJoin", "Map Join Operator"),
    (r"SortMergeJoin|ShuffledHashJoin", "Join Operator (reduce-side)"),
    (r"TakeOrderedAndProject|CollectLimit", "Fetch Operator (limit)"),
    (r"Expand", "Expand (multi-distinct)"),
    (r"Window", "PTF/Window Operator"),
]


@dataclass
class PlanReport:
    """Reference-vocabulary summary of a Spark physical plan."""

    spark_plan: str
    hive_operators: list[str] = field(default_factory=list)
    n_shuffles: int = 0
    broadcast_joins: int = 0
    shuffle_joins: int = 0
    pushed_filters: bool = False
    whole_stage_codegen: bool = False
    partition_filters: bool = False

    def summary(self) -> str:
        lines = [f"operators (reference vocabulary): {self.hive_operators}"]
        lines.append(f"shuffles (Map→Reduce edges): {self.n_shuffles}")
        lines.append(
            f"joins: {self.broadcast_joins} map-side / {self.shuffle_joins} reduce-side"
        )
        lines.append(f"predicate pushdown to scan: {self.pushed_filters}")
        lines.append(f"partition pruning: {self.partition_filters}")
        lines.append(f"vectorized/codegen execution: {self.whole_stage_codegen}")
        return "\n".join(lines)


def analyze(df: DataFrame) -> PlanReport:
    plan = df._jdf.queryExecution().executedPlan().toString()
    ops: list[str] = []
    for pat, hive_name in _NODE_MAP:
        if re.search(pat, plan) and hive_name not in ops:
            ops.append(hive_name)
    return PlanReport(
        spark_plan=plan,
        hive_operators=ops,
        n_shuffles=len(re.findall(r"Exchange (hash|range)partitioning", plan)),
        broadcast_joins=len(re.findall(r"BroadcastHashJoin", plan)),
        shuffle_joins=len(re.findall(r"SortMergeJoin|ShuffledHashJoin", plan)),
        pushed_filters=bool(re.search(r"PushedFilters: \[(?!\])", plan)),
        # codegen stages render as "*(n) Op" in tree form
        whole_stage_codegen=bool(
            re.search(r"\*\(\d+\)", plan) or "WholeStageCodegen" in plan
        ),
        partition_filters=bool(re.search(r"PartitionFilters: \[(?!\])", plan)),
    )
