"""Engine façade + multimodal plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datawarehouse_spark.catalog import load_tables
from datawarehouse_spark.engine import DataWarehouse
from datawarehouse_spark.operators import multimodal as mm
from tests.conftest import SF_ORACLE


def test_engine_sql_and_materialize(spark, tmp_path):
    dw = DataWarehouse(spark=spark, base_path=str(tmp_path))
    dw.register_sources(SF_ORACLE)
    df = dw.sql(
        "SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n FROM orders "
        "GROUP BY o_orderstatus",
        advise=False,
    )
    view = dw.materialize(df, layer="dws", table="order_status_counts")
    assert view.rows == df.count()
    back = dw.table("dws_order_status_counts")
    assert back.count() == view.rows
    rep = dw.explain_parity(df)
    assert "Group By Operator" in rep.hive_operators


def test_engine_rejects_unknown_layer(spark, tmp_path):
    dw = DataWarehouse(spark=spark, base_path=str(tmp_path))
    df = spark.range(3)
    try:
        dw.materialize(df, layer="nope", table="x")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_media_features_deterministic_and_shaped(spark):
    docs = load_tables(spark, SF_ORACLE, ("documents",))["documents"]
    media = mm.attach_media(docs)
    feats = mm.extract_features(media, n_features=8)
    rows = {r.media_id: r for r in feats.collect()}
    rows2 = {r.media_id: r for r in mm.extract_features(media, 8).collect()}
    assert len(rows) == docs.count()
    for mid, r in rows.items():
        assert r.n_bytes == 32
        assert len(r.features) == 8
        assert all(0.0 <= f <= 1.0 for f in r.features)
        assert 0.0 <= r.byte_entropy_proxy <= 1.0
        # Arrow round-trip determinism
        assert rows2[mid].features == r.features


def test_frame_sample_multiplies_rows(spark):
    docs = load_tables(spark, SF_ORACLE, ("documents",))["documents"]
    frames = mm.frame_sample(mm.attach_media(docs), every_n_bytes=16)
    assert frames.count() == docs.count() * 2
    lens = frames.select(F.length("frame_bytes").alias("n")).distinct().collect()
    assert {r.n for r in lens} == {16}


def test_decode_media_stub_raises():
    try:
        mm.decode_media("image", b"\x00")
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError:
        pass


def test_read_lake_csv_json_roundtrip(spark, tmp_path):
    """S6: csv and json lake readers recover the written rows; json
    props survive for F12-style extraction."""
    from datawarehouse_spark.engine import DataWarehouse
    from datawarehouse_spark.catalog import load_tables
    from tests.conftest import SF_SMOKE

    dw = DataWarehouse(spark, base_path=str(tmp_path / "wh"))
    src = (
        load_tables(spark, SF_SMOKE, ("events",))["events"]
        .select("event_id", "user_id", "event_type", "props")
        .limit(100)
    )
    csv_p, json_p = str(tmp_path / "lake_csv"), str(tmp_path / "lake_json")
    src.write.mode("overwrite").option("header", True).csv(csv_p)
    src.write.mode("overwrite").json(json_p)

    got_csv = dw.read_lake(csv_p, "csv", header=True, inferSchema=True)
    got_json = dw.read_lake(json_p, "json")
    assert got_csv.count() == 100 and got_json.count() == 100
    assert set(got_json.columns) == set(src.columns)
    # schema-on-read JSON column stays queryable (F12)
    ks = got_json.select(
        F.get_json_object("props", "$.k").cast("bigint").alias("k")
    )
    assert ks.filter(F.col("k").isNotNull()).count() > 0


def test_layered_warehouse_pipeline(spark, tmp_path):
    """End-to-end ODS→DWD→DWS→ADS layering (the reference's warehouse
    spine, docs/数据模型如何评论好坏.md:22): cleanse into DWD, summarize
    into DWS, rank into ADS — each layer materialized, registered, and
    re-read; final numbers agree with a direct computation."""
    from datawarehouse_spark.streaming.core import cleanse, read_events_batch
    from tests.conftest import SF_SMOKE

    dw = DataWarehouse(spark, base_path=str(tmp_path / "wh"))
    ods = read_events_batch(spark, SF_SMOKE)

    dwd = cleanse(ods)
    mv1 = dw.materialize(dwd, "dwd", "events_clean")
    assert mv1.rows == dwd.count()

    dws = (
        dw.table("dwd_events_clean")
        .groupBy(F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("pv"),
            F.sum(F.col("value").cast("decimal(38,2)")).cast("double").alias("amt"),
        )
    )
    dw.materialize(dws, "dws", "user_daily")

    ads = (
        dw.table("dws_user_daily")
        .orderBy(F.desc("pv"), F.asc("user_id"))
        .limit(5)
    )
    mv3 = dw.materialize(ads, "ads", "top_users")
    assert mv3.rows == 5

    direct = (
        ods.groupBy("user_id").count()
        .orderBy(F.desc("count"), F.asc("user_id")).limit(5)
    )
    got = {r.user_id for r in dw.table("ads_top_users").collect()}
    want = {r.user_id for r in direct.collect()}
    assert got == want


def test_resize_media_deterministic_and_bounded(spark):
    """Resize stub: every payload shrinks to exactly target_bytes, rows
    are preserved 1:1, and the op is deterministic."""
    docs = load_tables(spark, SF_ORACLE, ("documents",))["documents"]
    media = mm.attach_media(docs)
    small = mm.resize_media(media, target_bytes=16)
    rows = small.collect()
    assert len(rows) == docs.count()
    assert all(r.n_bytes == 16 and len(r.payload) == 16 for r in rows)
    again = {r.media_id: bytes(r.payload) for r in mm.resize_media(media, 16).collect()}
    assert all(bytes(r.payload) == again[r.media_id] for r in rows)


def test_materialize_incremental_partition_refresh(spark, tmp_path):
    """Re-materializing ONE partition's aggregate refreshes that
    partition in place (dynamic overwrite) and leaves the others'
    files untouched — incremental DWS maintenance."""
    import glob
    import os

    from datawarehouse_spark.streaming.core import read_events_batch
    from tests.conftest import SF_SMOKE

    dw = DataWarehouse(spark, base_path=str(tmp_path / "wh"))
    daily = (
        read_events_batch(spark, SF_SMOKE)
        .groupBy(F.to_date("ts").alias("dt"), "event_type")
        .agg(F.count(F.lit(1)).alias("pv"))
    )
    dw.materialize(daily, "dws", "daily_pv", partition_by=["dt"])
    path = str(tmp_path / "wh" / "dws" / "daily_pv")
    days = sorted(d for d in os.listdir(path) if d.startswith("dt="))
    assert len(days) >= 2
    target = days[0].removeprefix("dt=")
    before = {f: os.path.getmtime(f) for f in glob.glob(f"{path}/dt=*/*.parquet")}

    late = daily.filter(F.col("dt") == target).withColumn(
        "pv", F.col("pv") + F.lit(1000)
    )
    dw.materialize(late, "dws", "daily_pv", partition_by=["dt"])

    back = spark.read.parquet(path)
    assert back.filter(F.col("dt") == target).filter(F.col("pv") <= 1000).count() == 0
    untouched = {f for f in before if f"dt={target}" not in f}
    after = {f: os.path.getmtime(f) for f in glob.glob(f"{path}/dt=*/*.parquet")}
    assert untouched and all(after.get(f) == before[f] for f in untouched)


def test_read_lake_orc_and_text_roundtrip(spark, tmp_path):
    """S6: ORC (the reference's Hive-native columnar format) and text
    lake readers recover the written rows with pushdown intact."""
    from tests.conftest import SF_ORACLE

    dw = DataWarehouse(spark)
    src = load_tables(spark, SF_ORACLE, ("nation",))["nation"]

    orc_p = str(tmp_path / "lake_orc")
    src.write.mode("overwrite").orc(orc_p)
    got = dw.read_lake(orc_p, "orc")
    assert sorted(r.n_name for r in got.collect()) == sorted(
        r.n_name for r in src.collect()
    )
    # predicate pushdown reaches the ORC scan too
    plan = got.filter(F.col("n_nationkey") > 10)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(n_nationkey), GreaterThan(n_nationkey,10)]" in plan

    text_p = str(tmp_path / "lake_text")
    src.select(F.col("n_name").alias("value")).write.mode("overwrite").text(text_p)
    got_text = dw.read_lake(text_p, "text")
    assert got_text.count() == src.count()


def test_frame_sample_short_and_empty_payload_edges(spark):
    """Payload shorter than the stride → ONE partial frame; empty
    payload → zero frames (never the sequence(0,-1) ghost pair);
    non-multiple payloads keep their partial tail frame."""
    from datawarehouse_spark.operators import multimodal as mm

    media = spark.createDataFrame(
        [(1, "image", bytearray(b"abc")), (2, "audio", bytearray(b"")),
         (3, "video", bytearray(b"0123456789abcdefGHIJ"))],
        "media_id long, kind string, payload binary",
    )
    rows = sorted(
        (r.media_id, r.frame_idx, bytes(r.frame_bytes))
        for r in mm.frame_sample(media, every_n_bytes=16).collect()
    )
    assert rows == [
        (1, 0, b"abc"),
        (3, 0, b"0123456789abcdef"),
        (3, 1, b"GHIJ"),
    ]


def test_shard_pack_budget_and_block_invariance(spark):
    """Greedy packing semantics: shards are contiguous from 0, every
    item's START offset lies inside its shard's byte window, each
    non-final shard's content crosses its budget boundary (that's why
    the next item spilled over), and — the distributed-correctness
    core — the assignment is IDENTICAL for any range-block count."""
    from datawarehouse_spark.operators.multimodal import shard_pack

    ledger = spark.range(1, 301).select(
        F.col("id").alias("media_id"),
        (F.pmod(F.col("id") * 37, F.lit(5000)) + 100)
        .cast("bigint").alias("est_bytes"),
    )
    S = 64 * 1024
    a = {r.media_id: (r.shard, r.cum_bytes)
         for r in shard_pack(ledger, shard_bytes=S, n_blocks=8).collect()}
    b = {r.media_id: (r.shard, r.cum_bytes)
         for r in shard_pack(ledger, shard_bytes=S, n_blocks=3).collect()}
    assert a == b  # block layout must not leak into the answer

    rows = sorted(a.items(), key=lambda kv: kv[1][1])
    shards = [s for _, (s, _) in rows]
    assert shards[0] == 0
    assert set(shards) == set(range(max(shards) + 1))  # contiguous
    est = {r.media_id: r.est_bytes for r in ledger.collect()}
    for mid, (s, cum) in a.items():
        start = cum - est[mid]
        assert s * S <= start < (s + 1) * S
    # each non-final shard's content crosses its budget boundary —
    # that's WHY the next item spilled into a new shard
    last_cum_in_shard = {}
    for _, (s, cum) in a.items():
        last_cum_in_shard[s] = max(last_cum_in_shard.get(s, 0), cum)
    for s, end in last_cum_in_shard.items():
        if s < max(shards):
            assert end >= (s + 1) * S


def test_shard_pack_rejects_nonpositive_sizes(spark):
    """A NULL/zero/negative est_bytes must raise at execution (in the
    live size expression, not a prunable side column) instead of
    silently corrupting every downstream running byte total."""
    from datawarehouse_spark.operators.multimodal import shard_pack

    bad = spark.createDataFrame(
        [(1, 100), (2, 0), (3, 50)], "media_id long, est_bytes long"
    )
    with pytest.raises(Exception, match="must be > 0"):
        shard_pack(bad, shard_bytes=64, n_blocks=2).collect()


# --- standard-SQL façade shims (r10): MATCH_RECOGNIZE + WITH RECURSIVE ---


def test_sql_match_recognize_facade_matches_duckdb(spark, duck, tmp_path):
    """The MATCH_RECOGNIZE table-function shim must reproduce exactly
    what the SQL clause computes — checked against DuckDB running the
    same classify→string_agg→regex plan (the w12 verification recipe,
    but through the generic DEFINE/PATTERN compiler)."""
    from tests.oracle_compare import compare_query

    dw = DataWarehouse(spark, base_path=str(tmp_path / "wh"))

    def fn(spark_, sf_dir):
        ev = load_tables(spark_, sf_dir, ("events",))["events"].withColumn(
            "ts_us", F.unix_micros("ts")
        )
        return dw.sql_match_recognize(
            ev,
            partition_by=["user_id"],
            order_by=["ts_us", "event_id"],
            define={
                "V": "event_type = 'view'",
                "P": "event_type = 'purchase'",
            },
            pattern="V+ P",
        )

    oracle = """
    WITH seqs AS (
      SELECT user_id,
             string_agg(CASE WHEN event_type = 'view' THEN 'a'
                             WHEN event_type = 'purchase' THEN 'b'
                             ELSE '0' END, ''
                        ORDER BY epoch_us(ts), event_id) AS seq
      FROM events GROUP BY 1
    )
    SELECT user_id, seq,
           CAST(length(seq) AS BIGINT) AS n_rows,
           CAST(len(regexp_extract_all(seq, 'a+b')) AS BIGINT) AS n_matches,
           CAST(length(seq) - length(regexp_replace(seq, 'a+b', '', 'g'))
                AS BIGINT) AS matched_len
    FROM seqs
    """
    ok, msg = compare_query(spark, duck, fn, oracle, SF_ORACLE)
    assert ok, msg


def test_sql_hierarchy_facade_matches_recursive_cte(spark, duck, tmp_path):
    """The WITH RECURSIVE table-function shim: anchor relation written
    in plain SQL, closure run by the path-doubling operator — must
    equal DuckDB's genuine recursive CTE on the same synthetic forest
    (nation keys, parent = k div 2, root at 0)."""
    from datawarehouse_spark.operators.graph import hierarchy_oracle_sql
    from tests.oracle_compare import compare_query

    dw = DataWarehouse(spark, base_path=str(tmp_path / "wh"))
    anchor = (
        "SELECT n_nationkey AS k, "
        "CASE WHEN n_nationkey = 0 THEN NULL ELSE n_nationkey DIV 2 END AS p, "
        "CAST(n_regionkey AS DOUBLE) AS val FROM nation"
    )

    def fn(spark_, sf_dir):
        load_tables(spark_, sf_dir, ("nation",))
        return dw.sql_hierarchy(anchor, max_depth=8)

    nodes_cte = (
        "nodes AS (SELECT n_nationkey AS k, "
        "CASE WHEN n_nationkey = 0 THEN NULL ELSE n_nationkey // 2 END AS p, "
        "CAST(n_regionkey AS DOUBLE) AS val FROM nation)"
    )
    ok, msg = compare_query(
        spark, duck, fn, hierarchy_oracle_sql(nodes_cte), SF_ORACLE
    )
    assert ok, msg


def test_pattern_compiler_rejects_unknown_symbol_and_collisions():
    from datawarehouse_spark.operators.patterns import (
        compile_define,
        compile_pattern,
    )

    _, chars = compile_define({"V": "x = 1", "P": "x = 2"})
    assert compile_pattern("V+ P", chars) == "a+b"
    assert compile_pattern("(V P?){2,} | V", chars) == "(ab?){2,}|a"
    with pytest.raises(ValueError, match="not in DEFINE"):
        compile_pattern("V+ Q", chars)
    with pytest.raises(ValueError, match="at least one"):
        compile_define({})


def test_match_recognize_exclusivity_contract(spark):
    """compile_define is first-match-wins, which equals SQL:2016 only
    for mutually exclusive DEFINEs (ADVICE r10): the validator must
    flag overlapping conditions on data that exercises the overlap,
    pass disjoint ones, and sql_match_recognize(validate_exclusive=
    True) must raise on the overlap."""
    import pytest

    from datawarehouse_spark.operators.patterns import exclusive_violations

    df = spark.createDataFrame(
        [(1, 20), (2, 20), (3, 7)], "id long, v long"
    )
    overlapping = {"A": "v > 10", "B": "v > 5"}
    assert exclusive_violations(df, overlapping) == 1
    assert exclusive_violations(df, {"A": "v > 10", "B": "v <= 10"}) == 0

    dw = DataWarehouse(spark)
    with pytest.raises(ValueError, match="mutually exclusive"):
        dw.sql_match_recognize(
            df, partition_by=[], order_by=["id"],
            define=overlapping, pattern="A B",
            validate_exclusive=True,
        )


def test_match_recognize_pattern_with_regex_metachars_consistent(spark):
    """n_matches and matched_len must share one un-mangled regex even
    when the compiled pattern contains quoting-hostile characters —
    the Column-literal form (ADVICE r10). Pattern a{1,2}b via
    quantified DEFINE symbols; apostrophes in the data path."""
    df = spark.createDataFrame(
        [(1, 1, "x'a"), (1, 2, "x'a"), (1, 3, "pb")],
        "g long, o long, t string",
    )
    from datawarehouse_spark.operators.patterns import (
        compile_define,
        compile_pattern,
        match_recognize,
    )

    sym, chars = compile_define(
        {"A": "t = concat('x', chr(39), 'a')", "B": "t = 'pb'"}
    )
    pat = compile_pattern("A{1,2} B", chars)
    row = match_recognize(df, ["g"], ["o"], sym, pat).first()
    assert row["seq"] == "aab"
    assert row["n_matches"] == 1
    assert row["matched_len"] == 3


def test_exclusive_violations_not_null_poisoned(spark):
    """r11 review fix: a DEFINE condition evaluating to NULL on a row
    (e.g. a predicate over a NULL column) must count as 'did not
    match' — exactly compile_define's CASE semantics — not poison the
    per-row sum and hide a REAL overlap between the other conditions
    on the same row."""
    from datawarehouse_spark.operators.patterns import exclusive_violations

    df = spark.createDataFrame(
        [(20, None)], "v int, note string"
    )
    define = {"A": "v > 10", "B": "v > 5", "C": "note = 'y'"}
    # A and B both match the row while C is NULL: the overlap is real
    assert exclusive_violations(df, define) == 1
    # and an empty DEFINE raises the documented ValueError, not a
    # PySpark type error from filter(False)
    import pytest

    with pytest.raises(ValueError, match="at least one symbol"):
        exclusive_violations(df, {})


def test_hnsw_build_empty_and_singleton_corpus(spark):
    """r11 review fix: a 0- or 1-vector corpus yields a valid EMPTY
    adjacency (levels still emitted for the singleton), not an
    IndexError from the all-layers-skipped union."""
    from datawarehouse_spark.operators import similarity

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    levels, adj = similarity.hnsw_build(empty)
    assert adj.count() == 0 and levels.count() == 0
    one = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    levels1, adj1 = similarity.hnsw_build(one)
    assert adj1.count() == 0 and levels1.count() == 1


def test_hnsw_build_guards(spark):
    """r12 hardening (r11 advice): (a) dense_layer_cap above the
    enforced MAX_DENSE_LAYER_CAP ceiling raises — the written
    collect-lint bound is a real assertion, not aspiration; (b) a
    non-integral id column raises a clear error naming the constraint
    instead of crashing inside the int64 GEMM kernels; (c)
    require_dense=True fails loudly when a layer outgrows the cap
    instead of silently switching to the LSH branch (the gated
    query's oracle replays the dense build)."""
    import pytest

    from datawarehouse_spark.operators import similarity

    few = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="MAX_DENSE_LAYER_CAP"):
        similarity.hnsw_build(
            few, dense_layer_cap=similarity.MAX_DENSE_LAYER_CAP + 1
        )
    strs = spark.createDataFrame(
        [(str(i), [float(i), 1.0]) for i in range(8)],
        "vec_id string, embedding array<float>",
    )
    with pytest.raises(ValueError, match="integral id"):
        similarity.hnsw_build(strs)
    with pytest.raises(ValueError, match="require_dense"):
        similarity.hnsw_build(
            few, dense_layer_cap=0, require_dense=True,
            level_src=F.col("vec_id"),
        )
    # (d) r13: the search side's query-batch bound — hnsw_topk
    # broadcasts the query table, so an over-MAX_BEAM_QUERIES set must
    # fail loudly (naming the batch-ANN alternatives) BEFORE any build
    # work, not OOM an executor at scale
    big_q = spark.range(similarity.MAX_BEAM_QUERIES + 1).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).cast("array<float>")
        .alias("embedding"),
    )
    with pytest.raises(ValueError, match="MAX_BEAM_QUERIES"):
        similarity.hnsw_topk(few, big_q)


def test_sql_qualify_facade_matches_duckdb(spark, duck, tmp_path):
    """The QUALIFY shim (r11, third member of the standard-SQL façade
    family): three idioms — alias-referencing top-k per group, the
    direct-window dedup idiom, and a QUALIFY with an ORDER BY + LIMIT
    tail — each compared against DuckDB executing the GENUINE clause
    text on the same tables."""
    from tests.oracle_compare import compare_query

    dw = DataWarehouse(spark, base_path=str(tmp_path / "wh"))

    cases = [
        # top-3 per group, predicate references the window ALIAS
        ("SELECT o_orderpriority, o_orderkey, "
         "CAST(row_number() OVER (PARTITION BY o_orderpriority "
         "ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn "
         "FROM orders QUALIFY rn <= 3"),
        # dedup idiom: window expression directly in the predicate
        ("SELECT c_nationkey, c_custkey, c_acctbal FROM customer "
         "QUALIFY row_number() OVER (PARTITION BY c_nationkey "
         "ORDER BY c_acctbal DESC, c_custkey) = 1"),
        # trailing ORDER BY + LIMIT after the QUALIFY predicate
        ("SELECT o_orderstatus, o_orderkey, "
         "CAST(rank() OVER (PARTITION BY o_orderstatus "
         "ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS r "
         "FROM orders QUALIFY r <= 5 ORDER BY o_orderkey LIMIT 12"),
    ]
    for q in cases:
        def fn(spark_, sf_dir, q=q):
            load_tables(spark_, sf_dir, ("orders", "customer"))
            return dw.sql_qualify(q)

        ok, msg = compare_query(spark, duck, fn, q, SF_ORACLE)
        assert ok, f"{msg}\nquery: {q}"

    import pytest

    with pytest.raises(ValueError, match="no top-level QUALIFY"):
        dw.sql_qualify("SELECT 1 AS x")
    with pytest.raises(ValueError, match="no top-level QUALIFY"):
        # QUALIFY inside a string literal must not count
        dw.sql_qualify("SELECT 'QUALIFY' AS x FROM orders")


def test_sql_asof_join_facade_matches_duckdb_asof(spark, duck, tmp_path):
    """The ASOF JOIN shim (r11, fourth façade-family member): each
    user's purchase joins the most recent click at-or-before it —
    compared against DuckDB executing the GENUINE `ASOF LEFT JOIN`
    syntax on the same event slices."""
    from tests.oracle_compare import compare_query

    dw = DataWarehouse(spark, base_path=str(tmp_path / "wh"))
    left_sql = (
        "SELECT user_id, event_id AS purchase_id, "
        "unix_micros(ts) AS p_ts_us FROM events "
        "WHERE event_type = 'purchase'"
    )
    # one row per (user, time): keep the max click id on ts ties
    right_sql = (
        "SELECT user_id, unix_micros(ts) AS c_ts_us, "
        "MAX(event_id) AS click_id FROM events "
        "WHERE event_type = 'click' GROUP BY user_id, unix_micros(ts)"
    )

    def fn(spark_, sf_dir):
        load_tables(spark_, sf_dir, ("events",))
        return dw.sql_asof_join(
            left_sql, right_sql,
            on="user_id", left_time="p_ts_us", right_time="c_ts_us",
        )

    oracle = f"""
    WITH l AS (
      SELECT user_id, event_id AS purchase_id,
             epoch_us(ts) AS p_ts_us FROM events
      WHERE event_type = 'purchase'
    ), r AS (
      SELECT user_id, epoch_us(ts) AS c_ts_us,
             MAX(event_id) AS click_id FROM events
      WHERE event_type = 'click' GROUP BY user_id, epoch_us(ts)
    )
    SELECT l.user_id, l.purchase_id, l.p_ts_us, r.c_ts_us, r.click_id
    FROM l ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND r.c_ts_us <= l.p_ts_us
    """
    ok, msg = compare_query(spark, duck, fn, oracle, SF_ORACLE)
    assert ok, msg


def test_sql_qualify_guards(spark, tmp_path):
    """r11 review fixes: reserved __q name raises loudly; QUALIFY
    inside an escaped-quote literal is not treated as the clause; the
    scanner's keyword offsets survive non-ASCII text (upper() length
    changes must not desynchronize positions)."""
    import pytest

    dw = DataWarehouse(spark, base_path=str(tmp_path / "wh"))
    with pytest.raises(ValueError, match="__q"):
        dw.sql_qualify(
            "SELECT o_orderkey, 1 AS __q FROM orders "
            "QUALIFY row_number() OVER (ORDER BY o_orderkey) <= 3"
        )
    # r12: Spark resolves columns case-insensitively by default, so an
    # upper-case alias collides with the injected __q just the same —
    # the guard must be case-insensitive too
    with pytest.raises(ValueError, match="__q"):
        dw.sql_qualify(
            "SELECT o_orderkey, 1 AS __Q FROM orders "
            "QUALIFY row_number() OVER (ORDER BY o_orderkey) <= 3"
        )
    load_tables(spark, SF_ORACLE, ("orders",))
    # backslash-escaped quote inside the literal + non-ASCII chars
    # before the real clause keyword
    out = dw.sql_qualify(
        "SELECT o_orderkey, 'straße don\\'t QUALIFY me' AS note, "
        "CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS rn "
        "FROM orders QUALIFY rn <= 2"
    ).collect()
    assert len(out) == 2 and all("QUALIFY me" in r["note"] for r in out)
