"""Storage-layout operators: multi-dimensional clustering keys.

At 100 TB the scan you avoid is cheaper than any scan you optimize:
file-level data skipping (parquet row-group / file min-max pruning,
the manifest pruning in sources/snapshot.py) only works when rows
inside a file are CLOSE in the filtered dimension. A layout sorted on
one column gives perfect skipping on that column and none on any
other; interleaving the bits of several columns' rank codes — the
Z-order / Morton curve, the technique behind Delta Lake's OPTIMIZE
ZORDER BY and Iceberg's sort-order transforms — keeps every listed
dimension partially clustered, so a range predicate on ANY of them
prunes most files (measured in tests/test_io_and_skew.py::
test_zorder_layout_prunes_on_secondary_dimension).

Everything here is exact integer arithmetic (BIGINT scaling with
integer division, bit shifts and masks) inside whole-stage codegen —
deterministic, engine-portable, and SQL-oracle-checkable. No UDFs, no
floats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    out_col: str = "zkey",
) -> DataFrame:
    """Append Z-order curve columns: per-dimension rank codes
    ``z1..zD`` (each column min-max scaled to ``[0, 2^bits - 1]`` with
    exact BIGINT arithmetic — ``(x - min) * (2^bits - 1) DIV
    max(max - min, 1)``) and the interleaved Morton key ``out_col``
    (bit ``b`` of dimension ``d`` lands at position ``b·D + d``).

    Writing the table ordered by ``out_col`` (``repartitionByRange``
    on it, or a range-partitioned sort) clusters every listed
    dimension at once; ``bits·D`` must stay ≤ 63 (BIGINT).

    Scale shape: ONE aggregation computes all D min/max pairs (a
    scalar row, broadcast back — the same bounded-scalar crossJoin
    pattern as the TPC-H Q11/Q22 shapes); the scaling + interleave is
    a pure projection, so the whole key costs one scan plus the sort
    the caller was already paying for the write. NULLs in any listed
    column pin that dimension's code to 0 (they cluster together at
    the curve origin rather than poisoning the key to NULL).
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    ndim = len(cols)
    if bits * ndim > 63:
        raise ValueError(
            f"bits*dims = {bits * ndim} exceeds the 63-bit BIGINT budget"
        )
    scale = (1 << bits) - 1
    stats = df.agg(
        *[
            agg
            for i, c in enumerate(cols, 1)
            for agg in (
                F.min(F.col(c).cast("bigint")).alias(f"_mn{i}"),
                F.max(F.col(c).cast("bigint")).alias(f"_mx{i}"),
            )
        ]
    )
    j = df.crossJoin(F.broadcast(stats))
    zcols: list[Column] = []
    for i, c in enumerate(cols, 1):
        code = F.expr(
            f"CAST((CAST({c} AS BIGINT) - _mn{i}) * {scale} AS BIGINT) "
            f"DIV GREATEST(_mx{i} - _mn{i}, CAST(1 AS BIGINT))"
        )
        zcols.append(F.coalesce(code, F.lit(0)).alias(f"z{i}"))
    out = j.select(*df.columns, *zcols)
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for d in range(ndim):
            z = z + F.shiftleft(
                F.shiftright(F.col(f"z{d + 1}"), b).bitwiseAND(F.lit(1)),
                b * ndim + d,
            ).cast("bigint")
    return out.withColumn(out_col, z)


def file_range_profile(spark, path: str, col: str) -> DataFrame:
    """Per-file (min, max) of ``col`` for a parquet directory — the
    information a file-skipping reader holds in its footer/manifest
    statistics, surfaced as a DataFrame so layout quality is
    measurable: the fewer files whose range intersects a predicate,
    the fewer files a pruning scan opens."""
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min(F.col(col)).alias("mn"),
            F.max(F.col(col)).alias("mx"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def equiheight_histogram(
    df: DataFrame,
    value: str,
    tiebreak: str,
    k: int = 16,
    n_blocks: int | None = None,
) -> DataFrame:
    """Equi-height (equi-depth) histogram of a numeric column — the
    selectivity statistic a cost-based optimizer keeps per column
    (Spark's own ANALYZE TABLE ... FOR COLUMNS builds exactly this
    shape). Rows are ranked in (value, tiebreak) order — the composite
    is unique, so the rank and therefore every bucket boundary is
    deterministic — and row ``grn`` lands in bucket
    ``(grn-1)*k DIV n``: pure integer arithmetic, engine-portable,
    no float division anywhere. Emits per bucket: row count and the
    raw (untouched — no arithmetic, no rounding) lo/hi value bounds.

    Scale shape — the shared global-order primitive
    (operators/rank.py::global_rank, n_blocks auto-sized to the
    session's shuffle parallelism when omitted): one range shuffle,
    per-block row_number, an n_blocks-row broadcast offset/total
    table, then a map-side bucket projection into a k-row
    aggregation. The classic ntile() formulation would funnel the
    whole table through ONE partition's window; this never does.
    """
    if k < 1:
        raise ValueError(f"equiheight_histogram needs k >= 1, got {k}")
    from datawarehouse_spark.operators.rank import global_rank

    base = df.select(F.col(value).alias("v"), F.col(tiebreak).alias("tb"))
    ranked = global_rank(
        base, [F.asc("v"), F.asc("tb")], n_blocks=n_blocks,
        rank_col="grn", total_col="tot",
    )
    return (
        ranked.select(
            "v",
            # bigint DIV — exact integer division, never a float path
            F.expr(f"((grn - 1) * {int(k)}) div tot")
            .cast("bigint").alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
    )


def join_cardinality_stats(
    a: DataFrame,
    b: DataFrame,
    key_a: str,
    key_b: str,
    n_buckets: int = 16,
) -> DataFrame:
    """Histogram-based join-cardinality estimation vs ground truth:
    bucket the key domain into ``n_buckets`` fixed-width ranges (bounds
    from side b — the dimension side), and per bucket publish each
    side's row count and exact NDV, the System-R containment estimate
    ``n_a·n_b / max(ndv_a, ndv_b)``, the EXACT join size, and the
    estimate's relative error.

    Exactness: the exact size is Σ cnt_a·cnt_b over the per-key rollup
    join — the row-expanded join is never materialized; the two
    divisions (estimate, rel_err) run in the integer micro domain
    (·1e6, BIGINT floor-division, /1e6 once) so results sit on an
    engine-exact 1e-6 grid. Pre-clamp bucket arithmetic can go
    negative for keys outside b's range, where truncating and flooring
    division differ by at most 1 — both land ≤ 0 and clamp to bucket 0.

    Scale shape: both sides reduce to map-combined per-key rollups
    before the ONE key exchange; bucket stats are an n_buckets-row
    aggregate of that ndv-sized join; the (lo, hi) bounds row is a
    broadcast cross join.
    """
    ka = a.groupBy(F.col(key_a).alias("k")).agg(
        F.count(F.lit(1)).alias("cnt_a")
    )
    kb = b.groupBy(F.col(key_b).alias("k")).agg(
        F.count(F.lit(1)).alias("cnt_b")
    )
    bounds = b.agg(
        F.min(key_b).alias("lo"), F.max(key_b).alias("hi")
    )
    j = ka.join(kb, "k", "full_outer").crossJoin(F.broadcast(bounds))
    nb = int(n_buckets)
    bucket = F.expr(
        f"greatest(0L, least({nb - 1}L,"
        f" ((k - lo) * {nb}) DIV (hi - lo + 1)))"
    )
    zero = F.lit(0).cast("bigint")
    per = j.groupBy(bucket.alias("bucket")).agg(
        F.sum(F.coalesce("cnt_a", zero)).alias("n_a"),
        F.sum(F.col("cnt_a").isNotNull().cast("bigint")).alias("ndv_a"),
        F.sum(F.coalesce("cnt_b", zero)).alias("n_b"),
        F.sum(F.col("cnt_b").isNotNull().cast("bigint")).alias("ndv_b"),
        F.sum(F.coalesce("cnt_a", zero) * F.coalesce("cnt_b", zero))
        .alias("true_rows"),
    )
    est_micro = F.expr(
        "(n_a * n_b * 1000000L) DIV greatest(ndv_a, ndv_b)"
    )
    return per.select(
        "bucket",
        "n_a",
        "n_b",
        "ndv_a",
        "ndv_b",
        (est_micro.cast("double") / F.lit(1000000.0)).alias("est_rows"),
        "true_rows",
        F.when(
            F.col("true_rows") > 0,
            F.expr(
                "abs((n_a * n_b * 1000000L) DIV greatest(ndv_a, ndv_b)"
                " - true_rows * 1000000L) DIV true_rows"
            ).cast("double") / F.lit(1000000.0),
        ).alias("rel_err"),
    )


def compaction_plan(files: DataFrame, part_keys: list[str],
                    file_col: str, size_col: str,
                    target: int) -> DataFrame:
    """Small-file compaction planner — the batch planning half of the
    streaming small-file problem (SURVEY §2.1 S10: micro-batch sinks
    produce many small files; an async job merges them). Given a file
    inventory (one row per file with its size), assign files within
    each partition to merge GROUPS of ~``target`` size by cumulative
    next-fit: files are taken in a deterministic order and a new group
    starts whenever the running total crosses the target, i.e.
    ``group = cum_size_before_this_file DIV target``. A group can
    overshoot by at most one file — the standard compactor contract
    (Delta OPTIMIZE bin-packing has the same property).

    Exactness: sizes are integers, the assignment is integer division
    of an integer running sum — engine-identical by construction.

    Scale shape: the inventory is METADATA (one row per file, not per
    data row) — thousands of rows per partition even at 100 TB — so
    the per-partition running-sum window is cheap by construction; the
    one shuffle keys on the partition columns, never on file contents.
    The plan output drives the actual rewrite (read group → coalesce →
    write), which is embarrassingly parallel per group.
    """
    from pyspark.sql import Window as W

    w = (
        W.partitionBy(*part_keys)
        .orderBy("file_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        files.select(
            *part_keys,
            F.col(file_col).alias("file_id"),
            F.col(size_col).cast("bigint").alias("size"),
        )
        .withColumn("cum_after", F.sum("size").over(w))
        .select(
            *part_keys,
            "file_id",
            "size",
            (F.col("cum_after") - F.col("size")).alias("cum_before"),
            F.expr(f"(cum_after - size) DIV {int(target)}").alias("grp"),
        )
    )


def _hilbert_step(s: int, xin: str, yin: str, din: str) -> tuple[str, str, str]:
    """One unrolled Hilbert xy2d iteration (grid half-size ``s``) as
    dialect-portable SQL over the named input columns: quadrant index
    via CASE (≡ (3·rx) XOR ry without relying on a dialect XOR), then
    the Gray-code rotation/reflection. Shared verbatim by the Spark
    projection and the DuckDB oracle so the arithmetic cannot skew."""
    rx = f"(({xin} & {s}) > 0)"
    ry = f"(({yin} & {s}) > 0)"
    seg = (
        f"CASE WHEN {rx} AND {ry} THEN 2 WHEN {rx} THEN 3 "
        f"WHEN {ry} THEN 1 ELSE 0 END"
    )
    x = (
        f"CAST(CASE WHEN {ry} THEN {xin} WHEN {rx} THEN {s - 1} - {yin} "
        f"ELSE {yin} END AS BIGINT)"
    )
    y = (
        f"CAST(CASE WHEN {ry} THEN {yin} WHEN {rx} THEN {s - 1} - {xin} "
        f"ELSE {xin} END AS BIGINT)"
    )
    d = f"CAST({din} + CAST({s} AS BIGINT) * {s} * ({seg}) AS BIGINT)"
    return x, y, d


def hilbert_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    out_col: str = "hkey",
) -> DataFrame:
    """Append a 2-D Hilbert-curve clustering key: the same exact
    BIGINT min-max rank codes as :func:`zorder_key` (``z1``, ``z2``),
    then the Hilbert index from ``bits`` unrolled xy2d iterations —
    the locality-better sibling of Z-order (every unit step on the
    Hilbert curve is adjacent in space, so file ranges under range
    predicates are tighter than Morton's quadrant jumps; the layout
    family Delta/Iceberg expose as OPTIMIZE ... ZORDER/Hilbert).

    Exact integer arithmetic end to end (masks, CASE rotations,
    shifts) inside whole-stage codegen — no UDF, no float, and the
    per-iteration SQL text is shared with the DuckDB oracle
    (:func:`_hilbert_step`), so both engines compute bit-identical
    keys. Scale shape: identical to zorder_key — one scalar min/max
    broadcast, then a pure projection.
    """
    if len(cols) != 2:
        raise ValueError(f"hilbert_key is 2-D; got {len(cols)} columns")
    coded = zorder_key(df, cols, bits=bits, out_col="_zk_tmp").drop(
        "_zk_tmp"
    )
    out = coded.withColumn("_hx0", F.col("z1")).withColumn(
        "_hy0", F.col("z2")
    ).withColumn("_hd0", F.lit(0).cast("bigint"))
    n_it = 0
    for i, s in enumerate(2 ** b for b in range(bits - 1, -1, -1)):
        x, y, d = _hilbert_step(s, f"_hx{i}", f"_hy{i}", f"_hd{i}")
        out = (
            out.withColumn(f"_hx{i + 1}", F.expr(x))
            .withColumn(f"_hy{i + 1}", F.expr(y))
            .withColumn(f"_hd{i + 1}", F.expr(d))
        )
        n_it = i + 1
    drop = [f"_h{a}{i}" for a in "xyd" for i in range(n_it)]
    return out.withColumn(out_col, F.col(f"_hd{n_it}")).drop(
        *drop, f"_hx{n_it}", f"_hy{n_it}", f"_hd{n_it}"
    )


def hilbert_oracle_sql(
    table: str,
    col1: str,
    col2: str,
    keys: list[str],
    bits: int = 8,
) -> str:
    """DuckDB replay of :func:`hilbert_key` over ``table``: the
    identical scaling CTE as the Z-order oracle, then one chained CTE
    per xy2d iteration built from the SAME _hilbert_step text."""
    scale = (1 << bits) - 1
    key_list = ", ".join(keys)
    blocks = [
        f"""st AS (
      SELECT MIN({col1}) AS mn1, MAX({col1}) AS mx1,
             MIN({col2}) AS mn2, MAX({col2}) AS mx2
      FROM {table}
    )""",
        f"""h0 AS (
      SELECT {key_list}, {col1}, {col2},
             COALESCE(({col1} - mn1) * {scale}
                      // GREATEST(mx1 - mn1, 1), 0) AS z1,
             COALESCE(({col2} - mn2) * {scale}
                      // GREATEST(mx2 - mn2, 1), 0) AS z2,
             COALESCE(({col1} - mn1) * {scale}
                      // GREATEST(mx1 - mn1, 1), 0) AS x0,
             COALESCE(({col2} - mn2) * {scale}
                      // GREATEST(mx2 - mn2, 1), 0) AS y0,
             CAST(0 AS BIGINT) AS d0
      FROM {table}, st
    )""",
    ]
    n_it = 0
    for i, s in enumerate(2 ** b for b in range(bits - 1, -1, -1)):
        x, y, d = _hilbert_step(s, f"x{i}", f"y{i}", f"d{i}")
        blocks.append(
            f"""h{i + 1} AS (
      SELECT {key_list}, {col1}, {col2}, z1, z2,
             {x} AS x{i + 1}, {y} AS y{i + 1}, {d} AS d{i + 1}
      FROM h{i}
    )"""
        )
        n_it = i + 1
    body = ",\n    ".join(blocks)
    return f"""
    WITH {body}
    SELECT {key_list}, {col1}, {col2},
           CAST(z1 AS BIGINT) AS z1, CAST(z2 AS BIGINT) AS z2,
           d{n_it} AS hkey
    FROM h{n_it}
    """
