#!/usr/bin/env python
"""Per-query profiling helper for the optimization rounds.

Usage:
  python scripts/profile_query.py NAME [NAME...] [--members] [--plan OUT_DIR]
      [--reps N] [--sf DIR]

For each NAME (driver registry entry, or raw query with --raw semantics —
names are resolved against QUERIES first, then QUERIES_RAW):
  * times the noop-sink execution (min of --reps, default 2, after one
    sf0.001 warm-up rep) exactly like bench.py;
  * with --members and NAME a suite, also times each member individually;
  * with --plan DIR, writes ``DIR/<name>.txt`` containing
    ``df.explain("formatted")`` output.

This is an analysis tool only — it never writes bench artifacts.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _noop(fn, spark, sf_dir) -> float:
    # time fn() + the noop write, exactly like bench.py — operators
    # that eagerly localCheckpoint do their work at call time
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> None:
    args = sys.argv[1:]
    members = "--members" in args
    plan_dir = None
    reps = 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--members":
            pass
        elif a == "--plan":
            i += 1
            plan_dir = args[i]
        elif a == "--reps":
            i += 1
            reps = int(args[i])
        elif a == "--sf":
            i += 1
            sf_dir = args[i]
        else:
            names.append(a)
        i += 1

    from datawarehouse_spark.queries import QUERIES, QUERIES_RAW
    from datawarehouse_spark.queries.suites import SUITES
    from datawarehouse_spark.session import get_spark

    spark = get_spark(app_name="dw-profile")
    warm = "/root/testdata/sf0.001"
    if plan_dir:
        os.makedirs(plan_dir, exist_ok=True)

    for name in names:
        fn = QUERIES.get(name) or QUERIES_RAW.get(name)
        if fn is None:
            print(f"{name}: UNKNOWN", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        try:
            fn(spark, warm).write.mode("overwrite").format("noop").save()
        except Exception:
            pass
        sc = spark.sparkContext
        sc.setJobGroup(f"prof-{name}", name)
        best = min(_noop(fn, spark, sf_dir) for _ in range(reps))
        tracker = sc.statusTracker()
        jobs = tracker.getJobIdsForGroup(f"prof-{name}")
        stage_ids = []
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji:
                stage_ids.extend(ji.stageIds)
        n_tasks = 0
        for s in set(stage_ids):
            si = tracker.getStageInfo(s)
            if si:
                n_tasks += si.numTasks
        sc.setJobGroup(None, None)
        print(
            f"{name}: {best:.3f}s  jobs={len(jobs)//reps} "
            f"stages={len(set(stage_ids))//reps} tasks={n_tasks//reps} "
            f"(over {reps} reps)"
        )
        if plan_dir:
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plan_dir, f"{name}.txt"), "w") as fh:
                fh.write(txt)
        if members and name in SUITES:
            for tag, _, _ in SUITES[name]:
                mfn = QUERIES_RAW[tag]
                spark.sparkContext.setJobDescription(f"profile:{name}:{tag}")
                try:
                    mfn(spark, warm).write.mode("overwrite").format("noop").save()
                except Exception:
                    pass
                mbest = min(_noop(mfn, spark, sf_dir) for _ in range(reps))
                print(f"  {tag}: {mbest:.3f}s")
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
