"""SQL advisor — the reference's tuning guidance (docs/sql规范.md items
1-30, docs/sql调优.md solutions 1-8) encoded as mechanical plan/SQL
lints. Catalyst already APPLIES the semantics-preserving rewrites
(SURVEY §4.1); the advisor surfaces the intent-level ones a rewriter
must not apply silently.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class Advice:
    rule: str
    message: str
    reference: str  # file:line in the reference knowledge base


def lint_sql(sql: str) -> list[Advice]:
    """Static lints over a SQL string."""
    out: list[Advice] = []
    s = re.sub(r"\s+", " ", sql.lower())
    if re.search(r"select \*", s):
        out.append(
            Advice(
                "no-select-star",
                "project explicit columns so column pruning reaches the scan",
                "docs/sql规范.md:8-9",
            )
        )
    if " union " in s and " union all" not in s.replace("union all", ""):
        if re.search(r" union (?!all)", s):
            out.append(
                Advice(
                    "union-vs-union-all",
                    "UNION dedups+sorts; use UNION ALL when duplicates are "
                    "impossible or acceptable",
                    "docs/sql规范.md:147-166",
                )
            )
    if re.search(r"not in \(select", s):
        out.append(
            Advice(
                "not-in-subquery",
                "NOT IN over a nullable subquery is null-hostile and plans a "
                "null-aware anti join; prefer NOT EXISTS",
                "docs/sql规范.md:54-58",
            )
        )
    if re.search(r"order by(?!.* limit)", s) and " limit " not in s:
        out.append(
            Advice(
                "unbounded-global-sort",
                "global ORDER BY without LIMIT range-shuffles every row; "
                "sort only at the edge or add a LIMIT",
                "docs/sql规范.md:168-183,210",
            )
        )
    if re.search(r"where .*\b(\w+)\s*\*\s*\d+\s*[<>=]", s):
        out.append(
            Advice(
                "expression-on-column",
                "arithmetic on the filtered column defeats scan-level "
                "pushdown; move constants to the literal side",
                "docs/sql规范.md:97-102",
            )
        )
    if re.search(r"count\(distinct.*count\(distinct", s):
        out.append(
            Advice(
                "multi-count-distinct",
                "multiple COUNT(DISTINCT) in one aggregate plans an Expand "
                "(input ×N); consider pre-deduped temp tables at very large "
                "scale",
                "docs/sql调优.md:93-113, docs/HiveSQL.md:6-22",
            )
        )
    return out


def lint_plan(df: DataFrame) -> list[Advice]:
    """Plan-level lints over the optimized physical plan."""
    from datawarehouse_spark.plans.parity import analyze

    rep = analyze(df)
    out: list[Advice] = []
    plan = rep.spark_plan
    if re.search(r"CartesianProduct", plan):
        out.append(
            Advice(
                "cartesian-product",
                "cross join without broadcast: O(n·m) shuffle — broadcast "
                "the small side or add an equi-condition",
                "docs/sql调优.md:219-221",
            )
        )
    if re.search(r"BatchEvalPython|PythonUDF", plan) and "ArrowEvalPython" not in plan:
        out.append(
            Advice(
                "row-python-udf",
                "row-at-a-time Python UDF in the plan; use a pandas_udf "
                "(Arrow) or a built-in expression",
                "docs/实时数仓.md:42 (UDF dev model) + Spark guidance",
            )
        )
    # a Window whose input is a SINGLE-partition exchange = a window
    # with an empty partition spec over unbounded input: the whole
    # table funnels through one task's sort. The physical shape is the
    # Window node directly over (an optional Sort over) an Exchange
    # SinglePartition — consecutive lines, since Window and Sort are
    # unary. Bounded inputs never show the exchange: a rank-filter
    # plans TakeOrderedAndProject, a limit plans Local/GlobalLimit,
    # and a scalar agg's final merge hangs under HashAggregate, so
    # none of those false-positive here.
    if re.search(
        r"\bWindow\b[^\n]*\n(?:[^\n]*\bSort\b[^\n]*\n)?"
        r"[^\n]*Exchange SinglePartition",
        plan,
    ):
        out.append(
            Advice(
                "global-window",
                "window with an empty partition spec over unbounded "
                "input single-partitions the whole table; use the "
                "distributed global-rank pattern (operators/rank.py), "
                "orderBy+limit (TakeOrdered) for top-k, or an agg "
                "scalar broadcast back via crossJoin",
                "docs/sql调优.md:115-186 (数据倾斜/全局排序)",
            )
        )
    if rep.shuffle_joins and not rep.broadcast_joins:
        small_side = re.search(r"Statistics|sizeInBytes", plan)
        if small_side:
            out.append(
                Advice(
                    "maybe-broadcast",
                    "all joins are reduce-side; if one side is small "
                    "(<~2G in the reference), hint broadcast()",
                    "docs/sql调优.md:188-198",
                )
            )
    # same file relation scanned N times feeding a Union → N passes
    # over the fact table; the a22 rewrite (plans/rewrite.py) or a
    # materialized intermediate (engine.materialize) makes it one.
    # Gated on Union: duplicate scans WITHOUT one are usually a
    # legitimate self-join (e.g. broadcast topk, shingle self-join),
    # where a single-scan rewrite does not apply.
    scans = re.findall(r"FileScan \w+ [^\[]*\[[^\]]*\]", plan)
    rels: dict[str, int] = {}
    for s_ in scans:
        s_ = re.sub(r"#\d+", "", s_)  # strip per-subplan expression ids
        rels[s_] = rels.get(s_, 0) + 1
    dup = {s_: n for s_, n in rels.items() if n > 1}
    if dup and re.search(r"\bUnion\b", plan):
        worst = max(dup.values())
        out.append(
            Advice(
                "repeated-scan",
                f"the same relation is scanned {worst}× in one plan; "
                "collapse union'd aggregations to a single scan "
                "(rewrite.union_aggs_single_scan) or materialize the "
                "shared intermediate once",
                "docs/sql调优.md:73-113",
            )
        )
    if not rep.whole_stage_codegen:
        out.append(
            Advice(
                "no-codegen",
                "plan runs outside whole-stage codegen (vectorized mode in "
                "the reference); check for interpreter-only expressions",
                "docs/explain.md:61",
            )
        )
    return out
