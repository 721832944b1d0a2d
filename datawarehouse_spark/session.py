"""SparkSession factory with the reference-derived tuned profile.

The reference documents a shuffle/skew tuning profile
(docs/shuffle.md:125-171, docs/sql调优.md:157-169 in /root/reference):
sort-based shuffle with larger IO buffers, higher fetch retries for
very large shuffles, and AQE-style skew handling. On Spark those map
onto first-class configs; AQE subsumes the manual skew recipes at
runtime (docs/sql调优.md:202-259).

Scale stance: these settings are chosen for a real multi-executor
cluster at ~100 TB — AQE coalescing + skew-join handle the
per-query partition sizing so a single static
``spark.sql.shuffle.partitions`` doesn't have to be right for every
query; locally we default it to the core count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cpus() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count() or 4)
    except ValueError:
        return os.cpu_count() or 4


#: Configs applied to every session we build. Each maps to a tuning item the
#: reference documents (see module docstring); values are scale-safe defaults.
TUNED_PROFILE: dict[str, str] = {
    # AQE: runtime re-planning — coalesces small shuffle partitions and splits
    # skewed ones (subsumes reference skew solutions 3/6/7, docs/sql调优.md).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Broadcast threshold — the reference's map-join guidance ("small table a
    # few hundred MB", docs/sql调优.md:188-198). 64m is safe for executors
    # with >=4g heap; AQE can still upgrade to broadcast at runtime.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Shuffle IO profile (docs/shuffle.md:125-147): bigger write buffer and
    # in-flight fetch, more retries for 10B+-row shuffles.
    "spark.shuffle.file.buffer": "64k",
    "spark.reducer.maxSizeInFlight": "96m",
    "spark.shuffle.io.maxRetries": "10",
    "spark.shuffle.io.retryWait": "10s",
    # CBO: table/column stats (sources.io.analyze_table) drive join
    # reordering — the reference's Statistics-annotated planning
    # (docs/explain.md:41,96). No-op until ANALYZE populates stats.
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
    # Deterministic timestamps vs the DuckDB oracle (naive UTC).
    "spark.sql.session.timeZone": "UTC",
    # Hive-style lenient coercion (string dt compares, string↔number) —
    # SURVEY §7.3.2. ANSI-on would error on the reference's own SQL.
    "spark.sql.ansi.enabled": "false",
    # Arrow for every pandas_udf / toPandas hop.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # The fixture `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4
    # refuses by default; read as raw ns BIGINT, catalog converts to µs.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Fixture timestamps are parquet TIMESTAMP(isAdjustedToUTC=false); read
    # them as TIMESTAMP_LTZ (stored micros = UTC epoch micros) instead of
    # TIMESTAMP_NTZ so unix_micros/date_trunc/window line up with the
    # DuckDB oracle's naive-UTC epoch_us semantics.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # Parquet: vectorized reader on (default) + pushdown everything.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Partitioned-table writes: dynamic overwrite only replaces touched
    # partitions (reference's INSERT ... PARTITION semantics).
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    "spark.sql.ui.explainMode": "formatted",
}


def get_spark(
    app_name: str = "datawarehouse_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the tuned profile applied.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster pass ``None`` with a cluster master already configured via
    spark-submit and only the SQL confs apply.
    """
    cpus = _cpus()
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    builder = builder.config("spark.ui.enabled", "false")
    # managed-table location outside the repo (static conf)
    builder = builder.config("spark.sql.warehouse.dir", "/tmp/dw_spark_warehouse")
    for k, v in TUNED_PROFILE.items():
        builder = builder.config(k, v)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def apply_runtime_profile(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable part of the profile to an existing session.

    The driver hands our query callables a session we didn't build; SQL
    configs (timezone, ANSI, AQE) are runtime-mutable, so we pin the ones
    correctness depends on.
    """
    for key in (
        "spark.sql.session.timeZone",
        "spark.sql.ansi.enabled",
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.legacy.parquet.nanosAsLong",
        "spark.sql.parquet.inferTimestampNTZ.enabled",
    ):
        try:
            spark.conf.set(key, TUNED_PROFILE[key])
        except Exception:  # pragma: no cover - conf locked down
            pass
    try:
        # right-size shuffle parallelism when the host session left the
        # 200 default (reference: "过小" for big jobs, wasteful for local
        # runs, docs/sql调优.md:161); AQE coalescing refines per query
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            spark.conf.set("spark.sql.shuffle.partitions", str(_cpus()))
    except Exception:  # pragma: no cover
        pass
    return spark


def recommend_shuffle_partitions(
    input_bytes: int,
    target_partition_mb: int = 128,
    min_partitions: int | None = None,
    max_partitions: int = 200_000,
) -> int:
    """Size ``spark.sql.shuffle.partitions`` from the job's input
    volume — the static-sizing discipline for when AQE coalescing is
    unavailable (structured-streaming stateful ops pin partition
    count; some services disable AQE) or a starting point it refines.

    Rule: shuffle data ≈ input after pruning; a partition should fit
    comfortably in one task's execution-memory slice, so target
    ~``target_partition_mb`` (default 128 MB, the classic HDFS-block
    heuristic — spill-free for a 4 GB executor core at Spark's ~0.6
    execution fraction even with a 2-3× dedup/expand blow-up). Floors
    at the cluster's parallelism (``min_partitions``, default the
    local core count) so small jobs still use every core; caps at
    ``max_partitions`` to bound scheduler/shuffle-index overhead —
    the reference's observation that the 200 default is "too small"
    for big jobs, generalized in BOTH directions. (100 TB of input
    wants 819,200 raw and caps at 200,000 — at that point raise
    target_partition_mb instead.)
    """
    if input_bytes < 0:
        raise ValueError("input_bytes must be non-negative")
    want = -(-input_bytes // (target_partition_mb << 20))  # ceil div
    floor = min_partitions if min_partitions is not None else _cpus()
    return max(min(int(want), max_partitions), floor, 1)
