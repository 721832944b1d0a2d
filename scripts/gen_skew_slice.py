#!/usr/bin/env python
"""Generate the adversarial-SKEW bench variant (r10 verdict ask #4).

The scalecheck replicas and the sf1 slice grow VOLUME; this slice
grows SKEW at constant volume: an sf0.1-shaped directory where one
hot key holds ~10% of the rows of each big table, so the join/agg
suites and the dedup blocking family run against the reference's
数据倾斜 pathology (docs/sql调优.md:115-186) instead of the uniform
fixture. SCALE.md records hot-key line times vs uniform sf0.1; the
claim under test is that AQE skew-split + the salted recipes + the
hot-block/hot-shingle caps keep the max task bounded (≤ ~2×).

Deterministic hot-key assignment (no RNG): a row moves to the hot key
iff ``xxhash64(id) % 10 == 0`` — exactly ~10% and reproducible.

* events: ~10% of rows get the SMALLEST existing user_id → one hot
  user in every sessionize/funnel/groupBy-user path.
* lineitem: ~10% of rows get the smallest existing l_orderkey (hot
  PROBE side against a unique orders build row — the AQE skew-join
  shape) and the smallest l_suppkey/l_partkey (hot grouping keys).
* documents: ~10% of docs get one shared boilerplate PARAGRAPH
  prepended (bodies stay distinct — blocking keys get hot, true
  near-dup pairs don't go quadratic, so measured time is skew
  handling, not legitimate output blow-up). n_chars recomputed.
* other tables copy through unchanged.

Run:
    python scripts/gen_skew_slice.py
    SPARK_GRAFT_SF_DIR=/tmp/sfskew python bench.py --only \\
        suite_join_core,suite_skew_joins,suite_tpch,suite_agg_basic,\\
j5_salted_skew_join,a11_salted_two_phase_agg,suite_dedup_blocking,suite_dedup_pairs
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
HOT_FRACTION_MOD = 10  # xxhash64(id) % 10 == 0 → ~10%
BOILERPLATE = (
    "this boilerplate paragraph is shared across one tenth of the "
    "corpus to manufacture a hot blocking key without creating "
    "quadratic true duplicates"
)
UNCHANGED = "region nation customer supplier part orders".split()


def main(out_dir: str = "/tmp/sfskew") -> None:
    from pyspark.sql import functions as F

    from datawarehouse_spark.session import get_spark

    spark = get_spark(app_name="gen-skew-slice")
    os.makedirs(out_dir, exist_ok=True)

    def is_hot(col):
        return F.pmod(F.xxhash64(F.col(col)), F.lit(HOT_FRACTION_MOD)) == 0

    ev = spark.read.parquet(f"{SRC}/events.parquet")
    hot_user = ev.agg(F.min("user_id")).first()[0]
    ev.withColumn(
        "user_id",
        F.when(is_hot("event_id"), F.lit(hot_user)).otherwise(
            F.col("user_id")
        ),
    ).coalesce(4).write.mode("overwrite").parquet(
        f"{out_dir}/events.parquet"
    )

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    hot = li.agg(
        F.min("l_orderkey"), F.min("l_suppkey"), F.min("l_partkey")
    ).first()
    li.withColumn(
        "l_orderkey",
        F.when(is_hot("l_orderkey"), F.lit(hot[0])).otherwise(
            F.col("l_orderkey")
        ),
    ).withColumn(
        "l_suppkey",
        F.when(is_hot("l_suppkey"), F.lit(hot[1])).otherwise(
            F.col("l_suppkey")
        ),
    ).withColumn(
        "l_partkey",
        F.when(is_hot("l_partkey"), F.lit(hot[2])).otherwise(
            F.col("l_partkey")
        ),
    ).coalesce(4).write.mode("overwrite").parquet(
        f"{out_dir}/lineitem.parquet"
    )

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    docs = docs.withColumn(
        "text",
        F.when(
            is_hot("doc_id"),
            F.concat(F.lit(BOILERPLATE + "\n\n"), F.col("text")),
        ).otherwise(F.col("text")),
    ).withColumn("n_chars", F.length("text").cast("bigint"))
    docs.coalesce(4).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    for t in UNCHANGED + ["embeddings"]:
        src, dst = f"{SRC}/{t}.parquet", f"{out_dir}/{t}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copyfile(src, dst)

    for t, col in (("events", "user_id"), ("lineitem", "l_orderkey")):
        d = spark.read.parquet(f"{out_dir}/{t}.parquet")
        total = d.count()
        top = (
            d.groupBy(col).count().orderBy(F.desc("count")).first()
        )
        print(f"{t}: {total} rows, hot {col}={top[0]} holds "
              f"{top['count']} ({100.0 * top['count'] / total:.1f}%)")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfskew")
