"""Suite composition layer — the final driver-facing registry.

The driver's correctness gate verifies the first ~50 registry entries,
so the fine-grained per-operator queries (one per SURVEY §2 row, kept
in ``registry.QUERIES`` / exported as ``QUERIES_RAW``) are composed
here into a registry of ≤50 entries: flagship queries pass through
unchanged, and families of small single-operator queries are merged
into *union suites*.

A suite has the canonical schema ``(op, k1..kN, v1..vM)``: every
member query's output is projected onto it — an ``op`` tag naming the
member, key columns cast to string, value columns cast to double —
and the members are unioned. The DuckDB oracle applies the identical
projection over each member's existing oracle SQL (wrapped as a
derived table), so row-level verification fidelity is preserved: the
driver still hash-compares every row of every member operator.

Cast determinism (both engines agree bit-for-bit):
  * int/bigint → string and date → ISO string are exact;
  * boolean → 'true'/'false' in both Spark and DuckDB;
  * int → double is exact below 2^53 (all fixture counts/keys/micros);
  * member doubles already follow the exact-decimal-sum convention
    (see qutil), so double → double is the identity.
Timestamps never enter a suite — queries emitting them pass through
standalone (Spark and DuckDB disagree on fractional-second rendering).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse_spark.queries.llm import (
    fused_corpus_stats,
    fused_graph,
    fused_corpus_ops,
    fused_minhash_lsh,
    fused_multimodal,
    fused_text_quality,
)
from datawarehouse_spark.queries.registry import ORACLES as ORACLES_RAW
from datawarehouse_spark.queries.registry import QUERIES as QUERIES_RAW
from datawarehouse_spark.queries.profiles import fused_reshape_profiles
from datawarehouse_spark.queries.warehouse import (
    fused_agg_rewrites,
    fused_join_misc,
    fused_streaming_batch,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

# r14 suite fusion (optimization guide §2.4): a suite whose members
# re-derive the same intermediate (bigram counts, a BPE training chain,
# the word co-occurrence graph, MinHash signatures) computes it ONCE
# per suite run through these builders. A builder returns
# {member tag: DataFrame} overrides; tags it does not name fall back to
# the standalone QUERIES_RAW member. Overrides are built from the same
# operator code with prebuilt intermediates injected, so member rows
# are identical — the oracle SQL stays the unchanged per-member
# UNION ALL, and tests/test_oracle_parity.py pins fused ≡ standalone.
FUSED_BUILDERS: dict[str, Callable[[SparkSession, str], dict[str, DataFrame]]] = {
    "suite_text_quality": fused_text_quality,
    "suite_corpus_stats": fused_corpus_stats,
    "suite_graph": fused_graph,
    "suite_minhash_lsh": fused_minhash_lsh,
    "suite_agg_rewrites": fused_agg_rewrites,
    "suite_reshape_profiles": fused_reshape_profiles,
    "suite_join_misc": fused_join_misc,
    "suite_streaming_batch": fused_streaming_batch,
    "suite_multimodal": fused_multimodal,
    "suite_corpus_ops": fused_corpus_ops,
}

# tag (raw query name), key columns (→ string), value columns (→ double)
Member = tuple[str, list[str], list[str]]

SUITES: dict[str, list[Member]] = {
    # §2.1/§2.6 scan + order/limit + storage layout
    "suite_scan_sort": [
        ("s1_scan_project", ["r_name"], ["r_regionkey"]),
        ("o1_order_by_limit", [], ["l_orderkey", "l_linenumber", "l_extendedprice"]),
        # Z-order clustering key (r9): the multi-dimensional layout
        # extension of S2 pruning — all-BIGINT, exact as doubles
        ("s15_zorder_clustering", [],
         ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "z1", "z2", "zkey"]),
        # small-file compaction planner (r9): cumulative next-fit
        # grouping of a per-day file inventory — exact integers
        ("s16_compaction_plan", ["dt", "file_id"],
         ["size", "cum_before", "grp"]),
        # Hilbert-curve clustering key (r10): Z-order's locality-
        # better sibling, eight unrolled xy2d iterations — all BIGINT
        ("s18_hilbert_clustering", [],
         ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "z1", "z2", "hkey"]),
    ],
    # §2.2 predicates: filter, LIKE, IN list, date range, NULL, AND/OR/NOT
    "suite_predicates": [
        ("p2_filter_predicates", ["p_name"], ["p_partkey", "p_size", "p_retailprice"]),
        ("p4_like_patterns", ["p_name", "p_type"], ["p_partkey"]),
        ("p5_in_list", ["o_orderpriority", "o_orderstatus"], ["o_orderkey"]),
        ("p6_date_range", ["ship_month"], ["n_items", "base_price"]),
        ("p7_null_predicates", ["o_orderpriority"], ["n"]),
        ("p11_boolean_connectives", ["o_orderstatus", "o_orderpriority"], ["o_orderkey"]),
    ],
    # §2.2 subqueries: EXISTS semi, NOT EXISTS anti, NOT IN, scalar subquery
    "suite_subqueries": [
        ("p9_exists_semi", ["c_name"], ["c_custkey"]),
        ("p10_not_exists_anti", ["c_mktsegment"], ["c_custkey"]),
        ("p10_not_in_subquery", [], ["o_orderkey", "o_custkey"]),
        ("p13_scalar_subquery_anti", [], ["c_custkey", "c_acctbal"]),
        # P14 (r9): WITH RECURSIVE hierarchy — the oracle is a genuine
        # recursive CTE; the Spark side is a path-doubling closure
        ("p14_recursive_hierarchy", [],
         ["node_key", "depth", "root_key", "n_desc", "subtree_bal"]),
    ],
    # §2.4 basic aggregates: min/max, avg+having, DISTINCT, top-N,
    # exact percentiles (a17/a20 folded in to free registry slots —
    # row-level verification unchanged)
    "suite_agg_basic": [
        ("a7_min_max_times", [], ["user_id", "first_time_us", "last_time_us", "n_events"]),
        ("a8_avg_having", [], ["c_nationkey", "avg_bal", "n_cust"]),
        ("a12_distinct", ["c_mktsegment"], ["c_nationkey"]),
        ("a17_top_n", ["c_name"], ["c_custkey", "revenue"]),
        ("a20_percentiles", ["o_orderpriority"], ["p50", "p95"]),
        # two-phase salted hot-key agg (r13 rebalance: was a standalone
        # driver row since r1; folded here to free a registry slot for
        # llm_ffd_packing under the 50-entry gate cap — the suite union
        # keeps it row-level hash-verified, and the salting plan assert
        # lives in pytest regardless)
        ("a11_salted_two_phase_agg", ["event_type"],
         ["pv", "total_value"]),
        # Benford first-digit money-column audit (r10): injected-
        # literal expectations, decimal-string first digit
        ("dq_benford", ["digit"], ["n_d", "freq", "expected", "dev"]),
        # k-anonymity privacy gate over a quasi-identifier tuple (r10)
        ("dq_k_anonymity", ["c_mktsegment", "k_anon"],
         ["c_nationkey", "n", "risk"]),
        # l-diversity refinement: distinct-sensitive-value floor +
        # entropy of the sensitive distribution per QI class (r10)
        ("dq_l_diversity", ["l_diverse"],
         ["c_nationkey", "n", "l", "sens_entropy"]),
        # functional-dependency audit (r11): per asserted FD A→B, the
        # violating-group count / trapped rows / worst RHS cardinality
        # — integer-exact, one map-combined groupBy per FD; the check
        # set mixes holding and violated FDs
        ("dq_fd_audit", ["fd", "holds"],
         ["n_lhs", "n_violating", "viol_rows", "max_rhs"]),
    ],
    # §2.4 multi-dimensional: CUBE, ROLLUP, GROUPING SETS
    "suite_cube_rollup": [
        ("a16_cube", ["l_returnflag", "l_linestatus"], ["n", "sum_qty"]),
        ("a16_rollup", ["o_orderstatus", "o_orderpriority"], ["n", "total"]),
        ("a16_grouping_sets", ["o_orderstatus", "o_orderpriority"], ["n", "total"]),
    ],
    # §2.4 optimizer rewrites: redundant-groupby elim, count-distinct
    # extraction, key-distribution profiling
    "suite_agg_rewrites": [
        ("a13_redundant_groupby_elim", ["event_type"], ["n_pairs"]),
        # §4.1 candidate rule applied: N-branch union-agg as one scan
        ("a22_union_aggs_single_scan", ["branch", "event_type"],
         ["n", "total"]),
        ("a14_count_distinct_extraction", ["scope"], ["uv"]),
        ("a15_key_distribution", [], ["user_id", "cnt", "share"]),
        ("a21_approx_percentile", ["o_orderpriority", "approx_in_rank_band"],
         ["exact_p50"]),
        # T10 — batch-vs-stream reconciliation is itself a rewrite-
        # equivalence check (full-outer diff of two agg plans)
        ("t10_stream_batch_reconcile", ["event_type"],
         ["window_start_us", "batch_pv", "stream_pv",
          "batch_total", "stream_total"]),
        # daily-volume z-score anomaly scan (monitoring companion to
        # dq_audit; exact-integer variance, sqrt is the only libm)
        ("t11_daily_anomaly_scan", ["event_type", "dt", "is_anomaly"],
         ["c", "mean_c", "z"]),
        # MAD robust-outlier twin of t11 (r9): exact .25-grid medians,
        # Iglewicz-Hoaglin modified z on the unrounded score
        ("t13_mad_outlier_scan", ["event_type", "dt", "is_outlier"],
         ["c", "med_c", "mad_c", "rz"]),
        # ANALYZE-TABLE column statistics in one scan (r9) — the
        # profiling sibling of a15_key_distribution
        ("dq_column_profile", ["col_name", "min_str", "max_str"],
         ["n", "n_null", "n_distinct", "min_num", "max_num"]),
        # incremental materialized-view refresh (r9): delta merge vs
        # full-recompute oracle proves the partial-agg merge algebra
        ("a23_incremental_view_refresh", ["o_orderpriority", "order_month"],
         ["revenue", "n_orders", "min_price", "max_price", "avg_price"]),
        # incremental JOIN-view maintenance under a dim UPDATE (r11):
        # retraction anti-join + broadcast delta re-join vs the
        # full-recompute oracle — a23's algebra lifted to joins
        ("a27_incremental_join_refresh", ["c_mktsegment"],
         ["o_orderkey", "o_custkey", "o_totalprice"]),
        # equi-height histogram (r9): distributed-global-rank bucket
        # boundaries vs the oracle's single ROW_NUMBER
        ("dq_equiheight_histogram", [], ["bucket", "n_rows", "lo", "hi"]),
        # mergeable-bitmap exact distinct (r9): the groupBitmap rollup
        # algebra — A18's HLL shape with zero error
        ("a24_bitmap_distinct", ["event_type"], ["n_words", "uv"]),
        # trailing-8 EWMA smoother (r9): binary-fraction weights make
        # the monitoring series engine-exact with no rounding
        ("t16_ewma_smoothing", ["event_type", "dt"], ["c", "ewma"]),
        # CUSUM change-point monitor (r9): sequential recursion in
        # scaled-integer space; the oracle is a recursive CTE
        ("t18_cusum_changepoint", ["event_type", "dt", "is_alarm"],
         ["c", "cusum_n"]),
    ],
    # §2.7 set operations
    "suite_set_ops": [
        ("u1_union_all", ["name", "src"], []),
        ("u2_union_distinct", [], ["nationkey"]),
        ("u3_intersect", [], ["custkey"]),
        ("u4_except", [], ["custkey"]),
        # anti-entropy table checksums (r9): the 60-bit XOR-fold rides
        # as a string KEY — exact, no double-precision clipping
        ("dq_table_checksum", ["m", "checksum"], ["n_rows"]),
        # bag-semantics set ops (r9): multiplicity-aware EXCEPT ALL /
        # INTERSECT ALL next to U3/U4's set forms
        ("u5_except_all", [], ["custkey"]),
        ("u6_intersect_all", [], ["custkey"]),
    ],
    # §2.8 scalar/string functions
    "suite_scalar_string": [
        ("f1_scalar_suite", ["lname", "brand_type", "size_class"],
         ["p_partkey", "annual_price", "size_mod"]),
        ("f2_string_suite",
         ["u_brand", "name10", "type_us", "rev_brand", "size_pad",
          "first_word", "type5", "brand2"],
         ["p_partkey", "name_len", "first_a"]),
        # higher-order array functions (r9): transform/filter/
        # aggregate/element_at entirely in codegen vs DuckDB list_*
        ("f14_higher_order_arrays", ["first_long"],
         ["doc_id", "n_tok", "n_long", "total_len", "max_len"]),
    ],
    # §2.8 math + DECODE/COALESCE/CASE
    "suite_math_decode": [
        ("f6_math_suite", ["l_orderkey", "l_linenumber"],
         ["disc_dev", "price_ceil", "price_floor", "qty_sqrt",
          "max_rate", "min_rate", "disc_sign", "qty_mod"]),
        ("f8_decode_coalesce", ["status_desc", "pri_or_default", "is_open"],
         ["o_orderkey"]),
        # LSH S-curve evaluation (r11): observed candidate recall per
        # true-Jaccard decile vs the theoretical 1−(1−s²)⁴ band edges.
        # Moved here from suite_corpus_stats in r12 PURELY for line
        # balance (that line hit 14.8 s against the 13 s watch ceiling
        # after absorbing the BPE trio; this line idled at 0.5 s) —
        # same precedent as llm_domain_overlap's r8 move. The suite
        # union keeps it row-level hash-verified regardless of home.
        ("llm_lsh_scurve", ["band"],
         ["n_exact", "n_hit", "recall", "expect_lo", "expect_hi"]),
    ],
    # §2.8 date arithmetic / date parts / JSON access
    "suite_dates_json": [
        ("f10_date_suite", ["due_date", "month_end", "month_start", "plus_2m"],
         ["o_orderkey", "days_to_98", "dow_sun1"]),
        ("f13_date_parts", ["o_month_str"],
         ["o_orderkey", "o_year", "o_month", "o_quarter", "o_day"]),
        ("f12_json_extract", ["k_str"], ["event_id", "k_int"]),
        # T4 — business-time drift filter (timestamp range + JSON k
        # extraction via the streaming cleanse transform)
        ("t4_drift_filter_batch", ["event_type"],
         ["event_id", "ts_us", "user_id", "k"]),
        # T12 (r9) — dense-grid gap fill with linear interpolation on
        # the integer hour index (the resample-before-metrics step)
        ("t12_gap_fill", ["observed"], ["user_id", "h", "v_filled"]),
        # hypertable rollup (r9): LOCF time-weighted average per
        # (type, day) — integer-micro weighted sums, engine-exact
        ("t14_time_weighted_avg", ["event_type", "dt"],
         ["n_events", "span_us", "twa"]),
        # day-of-week seasonal profile + residual (r9): the weekly
        # normalization the volume monitors compare against
        ("t19_dow_seasonality", ["event_type", "dt"],
         ["dow", "c", "n_days", "dow_mean", "residual"]),
    ],
    # §2.5 windows: first/last value, default frame, partition count/sum
    "suite_windows_basic": [
        ("w1_first_last_value", ["first_event", "last_event"], ["user_id"]),
        ("w2_last_value_default_frame", ["lv"], ["event_id", "user_id"]),
        ("w3_w4_partition_count_sum", ["dt"], ["user_id", "day_pv", "day_value"]),
        # IGNORE NULLS forward fill (r9): LOCF as a window primitive —
        # Spark's last(ignorenulls) vs SQL's IGNORE NULLS
        ("w14_locf_ignore_nulls", ["event_type"],
         ["event_id", "user_id", "filled"]),
        # verify-then-drop near-dup gate twin (r12): band collision
        # nominates, exact Jaccard >= 0.5 decides — t22's false-drop
        # closer. Lives HERE purely for line balance (the gate family
        # t22/t23/t24 costs ~11.7 s together and pushed
        # suite_streaming_batch against the 13 s ceiling; this line
        # idled at ~1 s) — same precedent as llm_lsh_scurve's r12 move;
        # the suite union keeps it row-level hash-verified either way.
        ("t23_near_dup_gate_verified", ["dup_near", "keep"], ["doc_id"]),
    ],
    # §2.5 windows: window≡groupby pair, ranking, lag/lead, explicit
    # frames, ROWID-style dedupe (S13)
    "suite_windows_analytic": [
        ("w5_window_vs_groupby_join", ["dt"],
         ["user_id", "first_time_us", "last_time_us", "day_pv"]),
        ("w6_ranking", ["p_brand"],
         ["p_partkey", "p_retailprice", "rn", "rnk", "drnk"]),
        ("w6_lag_lead", ["next_event"], ["user_id", "event_id", "gap_us"]),
        ("w7_explicit_frames", [],
         ["event_id", "user_id", "running_total", "moving_3", "n_all"]),
        ("s13_window_dedupe", ["event_type"], ["event_id", "user_id"]),
        # cohort retention matrix (window-min cohort + distinct rollup)
        ("w9_cohort_retention", ["cohort_dt"], ["day_offset", "n_users"]),
        # Markov-funnel transition matrix P(next | current)
        ("w10_event_transitions", ["src", "dst"], ["n", "p_next"]),
        # bounded VALUE-RANGE frame (r9): trailing 90-day spend — the
        # frame family w7's ROWS/unbounded-RANGE members leave out
        ("w11_trailing_range_window", [],
         ["o_orderkey", "o_custkey", "day", "spend_90d", "n_90d"]),
        # CDC log collapse (r9): last-writer-wins + delete drop — the
        # binlog→ODS materialization, same window-dedupe shape as S13
        ("s17_cdc_apply", ["op"], ["o_orderkey", "last_seq", "price"]),
        # MATCH_RECOGNIZE-class row-pattern matching (r9): ordered
        # per-user event string + leftmost-greedy regex funnel
        ("w12_match_recognize", [],
         ["user_id", "n_events", "matched_len", "n_matches",
          "max_view_run"]),
        # windowed COUNT(DISTINCT) rewrite (r9): Spark rejects the
        # native form; size(collect_set) over the frame vs DuckDB's
        # genuine windowed DISTINCT — a rewrite-equivalence pair
        ("w13_windowed_count_distinct", [],
         ["event_id", "user_id", "n_types_so_far"]),
        # frame EXCLUDE CURRENT ROW (r9): leave-one-out peer mean —
        # native SQL:2011 EXCLUDE in the oracle vs Spark's
        # sum-minus-self rewrite
        ("w15_exclude_current_row", [],
         ["o_orderkey", "o_custkey", "n", "peer_mean"]),
        # composite funnel conversion (r13 rebalance: standalone driver
        # row since r1, folded here — with w9/w10 it completes the
        # funnel/cohort family — to free a registry slot under the
        # 50-entry gate cap)
        ("w8_funnel_conversion", ["c_mktsegment"],
         ["clickers", "converted"]),
    ],
    # §2.3 core joins: multi-way inner, left outer
    "suite_join_core": [
        ("j1_multiway_inner", ["c_mktsegment", "o_orderpriority"],
         ["n_items", "revenue"]),
        ("j2_left_outer", [], ["c_custkey", "n_orders", "total_spent"]),
    ],
    # §2.3 skew handling: split-skew union, null-key salting
    "suite_skew_joins": [
        ("j6_split_skew_union", ["c_mktsegment"], ["n_events", "total_value"]),
        ("j7_null_key_salted", ["p_brand"], ["n_items", "n_matched"]),
    ],
    # §2.3 join shapes: cast-key, cross, OR→union rewrite, theta
    "suite_join_misc": [
        ("j8_cast_key_join", ["c_mktsegment"], ["n_events", "uv"]),
        ("j9_cross_join", ["n_name", "r_name"], []),
        ("j10_or_join_union_rewrite", [], ["o_orderkey", "c_custkey"]),
        ("j13_theta_join", ["n_name"], ["n_orders"]),
        # point-in-time SCD2 dim join (feature-store correctness shape)
        # linear multi-touch attribution (r9): credit split over the
        # t6 interval-join pairs — one purchase-keyed window
        ("t15_multitouch_attribution", [],
         ["user_id", "purchase_id", "view_id", "view_ts_us",
          "n_touches", "touch_rank", "credit"]),
        # U-shaped 40/20/40 position attribution (r9): t15's industry
        # counterpart — same interval-join pairs, weighted credit
        ("t17_position_attribution", [],
         ["user_id", "purchase_id", "view_id", "view_ts_us",
          "n_touches", "touch_rank", "credit"]),
        # 2-itemset association rules (r11): basket self-join (theta
        # p1<p2 on the order key) + broadcast item counts; top-20 by
        # lift ranked on bit-identical raw doubles
        ("a26_market_basket", [],
         ["p1", "p2", "n12", "n1", "n2", "support", "confidence",
          "lift", "rank"]),
        ("j16_pit_dim_join", ["o_dt", "segment_at_order"],
         ["o_orderkey", "c_custkey", "eff_version"]),
        # SCD2 dim versioning (r13 rebalance: standalone driver row
        # since r1, folded next to its consumer j16_pit_dim_join to
        # free a registry slot under the 50-entry gate cap)
        ("scd2_dim_versioning", ["c_mktsegment", "is_current"],
         ["c_custkey", "eff_version"]),
    ],
    # §2.10 pivot / unpivot (X3) + rule/mining tag profiles (X4) —
    # merged into one row to keep the driver registry within the ~50-
    # entry budget when suite_tpch joined (fidelity unchanged: every
    # member is still row-level hash-verified)
    "suite_reshape_profiles": [
        ("x3_pivot_wide_tags", [],
         ["user_id", "click", "view", "purchase", "signup", "error"]),
        ("x3_unpivot_narrow_tags", ["tag"], ["user_id", "cnt"]),
        ("x4_rule_tag_profile", ["high_value"],
         ["user_id", "pv", "purchases", "purchase_amt"]),
        ("x4_mining_tag_scores", [], ["user_id", "score"]),
        # RFM quintile segmentation (date key is exact as ISO string)
        ("x5_rfm_segmentation", ["last_dt", "rfm"],
         ["custkey", "f_cnt", "m_amt", "r_score", "f_score", "m_score"]),
        # CBO statistics in action (r9): per-bucket containment
        # estimate of |orders JOIN customer| next to the exact size
        ("dq_join_cardinality_estimate", [],
         ["bucket", "n_o", "n_c", "ndv_o", "ndv_c",
          "est_rows", "true_rows", "rel_err"]),
        # the layered ODS→DWD→DWS→ADS pipeline end to end (r9): DWS is
        # a REAL engine.materialize parquet round-trip; the oracle runs
        # the same logic as one SQL chain — layer decomposition proven
        # semantics-preserving (placed here for suite balance: this
        # suite is the profile/report family and has bench headroom)
        ("dw1_layered_pipeline", ["event_type"],
         ["pv", "sum_daily_uv", "rev", "rev_share"]),
        # top-20 session journey paths (r10: sessionize → in-row path
        # string → TakeOrdered; the 用户路径分析 ADS report)
        ("x6_session_paths", ["path"], ["n_sessions", "rank"]),
        # week-over-week churn (r10: active-then-silent anti-join)
        ("x7_churn_detection", [],
         ["user_id", "n_events_before", "last_seen_us"]),
        # ABC/Pareto revenue classes (r10: distributed global cumsum —
        # rank.py::global_cumsum — never a single-partition window)
        ("x8_abc_analysis", ["abc"], ["custkey", "rev", "cum_share"]),
    ],
    # TPC-H workload suite (SURVEY §6's "TPC-H-class" claim made
    # runnable; Q1/Q18/Q22 live on as a1/a19/p13 → all 22 queries
    # covered, the 4 partsupp queries via the lineitem-derived
    # part-supplier relation — see queries/tpch.py)
    "suite_tpch": [
        ("tpch_q2", ["s_name", "n_name"], ["s_acctbal", "p_partkey"]),
        ("tpch_q3", ["o_date"], ["l_orderkey", "revenue"]),
        ("tpch_q4", ["o_orderpriority"], ["order_count"]),
        ("tpch_q5", ["n_name"], ["revenue"]),
        ("tpch_q6", [], ["revenue"]),
        ("tpch_q7", ["supp_nation", "cust_nation"], ["l_year", "revenue"]),
        ("tpch_q8", [], ["o_year", "mkt_share"]),
        ("tpch_q9", ["nation"], ["o_year", "sum_profit"]),
        ("tpch_q10", ["c_name", "n_name"], ["c_custkey", "revenue", "c_acctbal"]),
        ("tpch_q11", [], ["l_partkey", "value"]),
        ("tpch_q12", ["l_returnflag"], ["high_line_count", "low_line_count"]),
        ("tpch_q13", [], ["c_count", "custdist"]),
        ("tpch_q14", [], ["promo_revenue"]),
        ("tpch_q15", ["s_name"], ["s_suppkey", "total_revenue"]),
        ("tpch_q16", ["p_brand", "p_type"], ["p_size", "supplier_cnt"]),
        ("tpch_q17", [], ["avg_yearly"]),
        ("tpch_q19", [], ["revenue"]),
        ("tpch_q20", ["s_name"], ["s_acctbal"]),
        ("tpch_q21", ["s_name"], ["numwait"]),
    ],
    # LLM per-document scoring/filtering metrics (the r6 32-member
    # suite_text_metrics, split three ways so a red member paints a
    # ~1/3-sized, attributable row — VERDICT r6 ask #2)
    "suite_text_quality": [
        ("llm_fingerprints", ["fp_exact", "fp_norm"], ["doc_id"]),
        ("llm_text_quality", [],
         ["doc_id", "n_chars_actual", "n_tokens", "avg_token_len",
          "stopword_ratio"]),
        ("llm_lang_id", ["lang_label", "lang_pred"], ["doc_id"]),
        ("llm_bpe_token_count", [], ["doc_id", "n_bpe_tokens"]),
        # Gopher repetition cuts + benchmark decontamination
        ("llm_repetition", ["gopher_fail"],
         ["doc_id", "n_words", "n_distinct_words", "top_word_ratio",
          "dup_word_ratio", "dup_bigram_ratio", "top_bigram_ratio"]),
        ("llm_contamination", [], ["doc_id", "n_sh", "n_hit",
                                   "contaminated_frac"]),
        # PII scrub: redacted text is an exact string key
        ("llm_pii_redact", ["redacted"],
         ["doc_id", "n_email", "n_ip", "n_phone"]),
        # corpus-trained bigram-LM perplexity (CCNet/KenLM filter shape)
        ("llm_lm_perplexity", [],
         ["doc_id", "n_bigrams", "avg_logp", "ppl"]),
        # Kneser-Ney twin of the add-one bigram LM (r9): the
        # production KenLM smoothing, same one-count lineage
        ("llm_kn_perplexity", [],
         ["doc_id", "n_bigrams", "kn_avg_logp", "kn_ppl"]),
        # perplexity-ordered curriculum phases (block-offset global rank)
        ("llm_curriculum", [],
         ["doc_id", "n_bigrams", "ppl", "n_tok", "rank", "phase"]),
        # unigram entropy (information-density quality dial)
        ("llm_token_entropy", [],
         ["doc_id", "n_tok", "n_distinct", "entropy_bits",
          "norm_entropy"]),
        # DSIR importance-resampling weights (exact-integer formulation)
        ("llm_importance_weights",
         [], ["doc_id", "n_tok", "s_target", "s_corpus", "weight"]),
        # fit-on-slice / score-corpus residual quality calibration
        ("llm_quality_calibration", ["lang", "is_outlier"],
         ["doc_id", "n_tok", "stop_ratio", "slope", "intercept",
          "resid"]),
        # (r13 rebalance: llm_word_communities moved HOME to
        # suite_graph — the r11 "line balance" reason inverted once
        # this line hit 10.15 s idle while suite_graph sat at 6.8)
        # (r10 rebalance: the shingle-fingerprint members — winnow,
        # novelty, dup-span coverage — moved to suite_fingerprints,
        # and the corpus-statistics members — zipf, tfidf — to
        # suite_corpus_stats, bringing this line from 16.3 s idle back
        # under the budget)
    ],
    # shingle-fingerprint diagnostics (r10 rebalance: split from
    # suite_text_quality, which sat at 16.3 s idle — these three share
    # the positional-shingle machinery and are each per-doc metrics)
    "suite_fingerprints": [
        # fp is a 60-bit int — exact as a string key, NOT as a double val
        ("llm_winnow_fingerprints", ["fp"], ["doc_id"]),
        # temporal novelty: first-seen shingle fraction per doc
        ("llm_novelty", [], ["doc_id", "n_sh", "n_novel", "novelty"]),
        # cross-doc duplicated-span coverage (boilerplate signal; the
        # pair-free half of the dup-span family)
        ("llm_dup_span_coverage",
         [], ["doc_id", "n_shingles", "n_dup", "dup_frac"]),
        # m-bit/k-hash Bloom membership with REALIZED false-positive
        # counts (md5 bits — both engines build the identical filter;
        # r10 pass 2: from suite_corpus_ops — a probabilistic
        # fingerprint belongs with the fingerprint diagnostics)
        ("llm_bloom_contamination", [],
         ["doc_id", "n_sh", "n_bloom", "n_exact", "n_fp", "bloom_frac"]),
        # (r13 pass 2: llm_minhash_accuracy moved HOME to
        # suite_minhash_lsh — this line measured 10.04 s idle, exactly
        # at the working target with zero r14 headroom, and the
        # accuracy audit is the MinHash pipeline's own diagnostic)
    ],
    # corpus-level term statistics (r10 rebalance: pulled from the
    # overweight text-quality and corpus-mix lines — these five are
    # the "vocabulary dashboards": distribution shapes, collocations,
    # salience, divergence)
    "suite_corpus_stats": [
        # Zipf rank-frequency slope per language (vocab health dial)
        ("llm_zipf_slope", ["lang"],
         ["n_terms", "zipf_slope", "zipf_intercept"]),
        # per-doc top-3 TF-IDF terms (corpus-level term statistics)
        ("llm_tfidf_top_terms", ["term"], ["doc_id", "tfidf", "rank"]),
        # per-domain unigram KL vs the corpus mix (data-mixing dial)
        ("llm_domain_kl", ["source"], ["n_tok", "n_vocab", "kl_bits"]),
        # count-min-sketch heavy hitters (oracle-exact: md5 buckets
        # make both engines' sketches bit-identical)
        ("llm_cms_heavy_hitters", ["token"],
         ["exact_c", "cms_est", "overcount", "rank"]),
        # PMI collocation mining (phrase/tokenizer-merge candidates)
        ("llm_pmi_collocations", ["w1", "w2"],
         ["c12", "c1", "c2", "pmi", "rank"]),
        # BPE tokenizer training (6 merges; symbols are string keys) —
        # r10 pass 2 from suite_corpus_mix: tokenizer statistics
        ("llm_bpe_merges", ["lhs", "rhs"],
         ["merge_rank", "pair_count"]),
        # ...and the trained tokenizer applied to the vocabulary
        ("llm_bpe_segment", ["w", "seg"], ["f", "n_syms"]),
        # ...and its per-document fertility rollup (train-then-measure)
        ("llm_tokenizer_fertility",
         [], ["doc_id", "n_words", "n_syms", "fertility"]),
    ],
    # LLM dedup pair generation / blocking / graph resolution (the
    # pair-join heavy third of the old suite_text_metrics; absorbs the
    # llm_exact_dedup and llm_simhash standalones to stay ≤50 entries)
    "suite_dedup_pairs": [
        ("llm_exact_dedup", ["fp"], ["n_docs", "keep_id"]),
        # quality-aware canonical pick within exact-dup groups (keep
        # the longest copy, not the arbitrary min-id one)
        ("llm_exact_dedup_keep_best", ["fp", "keep"],
         ["doc_id", "n_chars", "keep_id"]),
        # simhash is a 63-bit int — exact as a string key only
        ("llm_simhash", ["simhash"], ["doc_id"]),
        # LOSSLESS prefix-filtered exact Jaccard join (PPJoin family) —
        # oracle is the naive all-pairs join, proving losslessness
        ("llm_prefix_filter_pairs", [],
         ["doc_a", "doc_b", "n_a", "n_b", "inter", "jaccard"]),
        # domain-pair shingle Jaccard (acquisition-level leakage
        # matrix) — a pair op, moved here from suite_corpus_mix in r8
        # to keep every driver line under 16 s at sf0.1
        ("llm_domain_overlap", ["source_a", "source_b"],
         ["n_a", "n_b", "n_common", "jaccard"]),
        # paragraph-granular first-occurrence dedup with document
        # reassembly (CCNet/Dolma cleaning; r8) — block-level dedup,
        # so it lives with the dedup family (this suite has bench
        # headroom after the r8 blocking split: 7.9 s)
        ("llm_paragraph_dedup", ["clean_text"],
         ["doc_id", "n_blocks", "n_kept"]),
    ],
    # LLM dedup blocking strategies that emit candidate pairs through a
    # global order or asymmetric containment — split out of
    # suite_dedup_pairs in r8 (VERDICT r7 ask #3: that suite sat at
    # ~19.8 s, one member from the 20 s bench ceiling; the split keeps
    # every driver line under 16 s while preserving per-member
    # row-level hash verification)
    "suite_dedup_blocking": [
        # (r13 rebalance: sorted-neighborhood moved to the new
        # suite_pair_blocking — this line measured 12.04 s idle; the
        # remaining members are the span/edit-distance family)
        # (r10 rebalance: containment pairs moved to suite_minhash_lsh
        # — this was the heaviest driver line at 16.4 s idle / 18.6 s
        # in the r9 capture, one candidate-pair member over budget)
        # span removal: kept token ranges after corpus-frequent span
        # removal (its per-doc coverage twin lives in
        # suite_text_quality for suite balance)
        ("llm_dup_span_remove",
         [], ["doc_id", "span_start", "span_end", "n_kept"]),
        # EXACT duplicated-substring spans (r12, Lee et al. 2021):
        # verbatim >=20-token repeats via positional L-window
        # fingerprints — the exact sibling of the shingle-approximate
        # remover above
        ("llm_exact_dup_spans",
         [], ["doc_id", "span_start", "span_end", "span_len"]),
        # the rolling-hash impl twin (r14): same spans via Rabin-Karp
        # mapInPandas fingerprints, hash-verified against the SAME
        # md5-window oracle — the driver gate proves the 100 TB
        # constant-factor path span-identical every round
        ("llm_exact_dup_spans_rolling",
         [], ["doc_id", "span_start", "span_end", "span_len"]),
        # typo-tolerant key matching (Ed-Join, r9): lossless q-gram
        # prefix + length filter before the levenshtein verify
        ("llm_edit_distance_pairs", [],
         ["doc_a", "doc_b", "len_a", "len_b", "dist"]),
    ],
    # LLM corpus mixing / sampling / packing / tokenizer training (the
    # dataset-assembly third; absorbs the llm_stratified_sample
    # standalone)
    "suite_corpus_mix": [
        ("llm_train_split", ["split"], ["doc_id"]),
        # incremental ingestion dedup: new batch vs existing corpus
        # (placed here for suite balance — ingestion IS the assembly
        # step; the other pair ops stay in suite_dedup_pairs)
        ("llm_incremental_dedup", ["dup_exact", "dup_near", "keep"],
         ["doc_id"]),
        # deterministic global shuffle: stable (shard, pos) addresses
        ("llm_global_shuffle", [], ["doc_id", "shard", "pos"]),
        ("llm_seq_packing", [], ["doc_id", "shard", "n_tokens", "pack_id"]),
        # RAG / long-doc chunking: stable (chunk_id, token-range)
        # addresses; chunk text is an exact string key
        ("llm_chunk", ["chunk_text"],
         ["doc_id", "chunk_id", "tok_start", "tok_end", "n_chunk_tokens"]),
        # per-domain token-budget capping (corpus balancing)
        ("llm_domain_cap", ["source", "keep"],
         ["doc_id", "n_tokens", "cum_before"]),
        # per-domain quality-percentile gate (top-band filtering)
        ("llm_quality_filter", ["source", "keep"],
         ["doc_id", "score", "pr"]),
        # domain mixing: per-language md5-bucket keeps at target rates
        ("llm_stratified_sample", ["lang", "keep"], ["doc_id"]),
        # r11: the streaming gate chain's batch twin (keep-first exact
        # dedup ∘ Gopher ∘ contamination ∘ fixed quality band) — the
        # deterministic oracle surface of the foreachBatch pipeline
        ("llm_corpus_gates",
         ["dup_exact", "gopher_ok", "clean", "quality_ok", "keep"],
         ["doc_id"]),
        # cluster-balanced diversity sampling: equal md5-ordered quotas
        # from the k-means partition of the embedding space (corpus
        # SELECTION, so it lives with the assembly ops; the clustering
        # primitive itself is verified in suite_embeddings)
        ("llm_cluster_balanced_sample", [],
         ["vec_id", "cluster", "dist2", "pick"]),
        # (r10 rebalance: domain-KL, CMS heavy hitters and PMI
        # collocations moved to suite_corpus_stats — they are corpus
        # STATISTICS, not assembly steps, and this line sat at 14.2 s)
        # length-bucketed inference batching (padding minimizer)
        ("llm_batch_by_length", [],
         ["doc_id", "n_tokens", "bucket", "batch_id", "batch_max",
          "padding"]),
        # PPS token-budget sampling (boolean accept is a string key)
        ("llm_pps_sample", ["accept"],
         ["doc_id", "n_tokens", "max_nt", "u"]),
        # temperature-scaled (alpha=0.5) multinomial language mixing
        ("llm_source_mix", ["lang", "accept"],
         ["doc_id", "c_grp", "w_grp", "q"]),
        # (r10 rebalance pass 2: the BPE train/apply/fertility trio
        # moved to suite_corpus_stats — tokenizer statistics — to keep
        # this assembly line inside the bench budget)
    ],
    # embedding-space similarity + semantic dedup: exact near-dup pairs,
    # brute cosine top-k baseline, SemDeDup keep-list
    "suite_embeddings": [
        ("llm_embed_near_dup", [], ["id_a", "id_b", "cos"]),
        ("llm_cosine_topk", [], ["q_id", "n_id", "cos", "rank"]),
        ("llm_semantic_dedup", ["keep"],
         ["vec_id", "cluster", "max_prior_sim"]),
        # BM25 lexical retrieval — the embedding family's lexical twin
        ("llm_bm25_topk", ["qid"], ["doc_id", "score", "rank"]),
        # fixed-iteration Lloyd's k-means (unrolled-CTE oracle).
        # llm_pagerank moved OUT to a standalone driver row in r8:
        # with k-means and BM25 both here the suite sat at 15.7 s —
        # one member from the bench ceiling (VERDICT r7 ask #3).
        ("llm_kmeans", [], ["vec_id", "cluster", "dist2"]),
        # LSH ANN bucket+rerank — driver-checked since r8: the
        # md5-derived hyperplanes make sign-bit bucketing exact
        # arithmetic, so the oracle unrolls the projection per plane
        # (VERDICT r7 ask #4); recall properties stay in pytest
        ("llm_ann_lsh_topk", [], ["q_id", "n_id", "cos", "rank"]),
        # SQ8 int8 quantization audit — integer-micro-domain codes and
        # reconstruction error, oracle-exact (r8)
        ("llm_sq8_quantize", [],
         ["vec_id", "n_dims", "total_abs_err", "max_abs_err",
          "avg_code"]),
        # IVF ANN on the decimal grid — driver-checked since r9: the
        # coarse quantizer is the same unrolled-CTE k-means, so index
        # training AND probe+rerank replay exactly (VERDICT r8 ask #3)
        ("llm_ann_ivf_topk", [], ["q_id", "n_id", "cos", "rank"]),
        # (r13 rebalance: llm_ann_ivfpq_grid promoted to its own
        # standalone driver row — the suite measured 11.21 s idle and
        # IVF-PQ was its 4.7 s heaviest member; as a standalone line a
        # regression in the heaviest ANN pipeline is attributable)
    ],
    # corpus lifecycle + sketch-membership + eval ops (new in r8):
    # version diffing, Bloom contamination, exact-N sampling, and the
    # ANN-recall measurement itself as an oracle-checked query
    "suite_corpus_ops": [
        # Member ORDER here is construction-SUBMISSION order for the
        # suite's 3-thread pool (guide §2.6) — heavy-at-construction
        # members lead so their driver-synced job chains start
        # immediately and the cheap/lazy members back-fill, instead of
        # the heaviest (kcore, ~2 s of peel-round jobs) tailing alone
        # after the pool drains. Union order changes nothing the gate
        # can see: the canonical (op, k*, v*) row multiset is
        # order-insensitive on both engines (the oracle UNION is
        # generated from this same list).
        # k-core nucleus of the near-dup graph (r10) — bounded peel
        # rounds, exact integers; the suite-mate of the corpus
        # lifecycle audits (its sibling triangle/TextRank members
        # live in suite_graph after the r10 rebalance)
        ("llm_graph_kcore", ["in_kcore"],
         ["doc_id", "degree", "core_degree"]),
        # one ingestion step of streaming paragraph dedup (batch slice
        # vs accumulated block registry; r8) — the oracle-gated twin
        # of the foreachBatch replay test in tests/test_streaming.py
        ("llm_incremental_paragraph_dedup", ["clean_text"],
         ["doc_id", "n_blocks", "n_kept"]),
        # per-source boilerplate block removal with reassembly
        # (CCNet/FineWeb line-dedup; r8) — corpus cleaning, so it
        # lives with the lifecycle ops
        ("llm_boilerplate_blocks", ["source", "clean_text"],
         ["doc_id", "n_blocks", "n_kept"]),
        # recall@5 + reciprocal rank of the LSH path vs exact cosine —
        # the index-quality eval, oracle-checked end to end
        ("llm_ann_quality", [],
         ["q_id", "n_exact", "n_ann", "n_overlap", "recall", "rr"]),
        # Matryoshka truncation quality (r9): top-5 overlap of
        # prefix-dim vs full-dim exact cosine per truncation width
        ("llm_mrl_quality", [],
         ["q_id", "d", "n_full", "n_overlap", "overlap_frac"]),
        # added/removed/changed/unchanged between corpus versions
        ("llm_corpus_diff", ["status", "old_fp", "new_fp"], ["doc_id"]),
        # (r10 rebalance pass 2: Bloom contamination moved to
        # suite_fingerprints — a probabilistic-fingerprint membership
        # op — after llm_graph_kcore joined this line and the
        # two-sample idle bench put it at 14.1 s, the round's heaviest)
        # exact-N deterministic uniform sample (md5-priority reservoir)
        ("llm_reservoir_sample", ["pri"], ["doc_id", "pick"]),
    ],
    # graph analytics over corpus-derived graphs (r10: a home for the
    # iterative/graph family so no single line carries two pair-graph
    # regenerations — triangles moved here from suite_corpus_ops)
    "suite_graph": [
        # triangle count + clustering coefficient over the near-dup
        # graph (r9) — density audit of the duplication clusters;
        # degree-ordered compact-forward, exact integers + one IEEE
        # division
        ("llm_graph_triangles", [],
         ["doc_id", "degree", "n_tri", "clustering"]),
        # TextRank keywords (r10): the PageRank engine over the word
        # co-occurrence graph, top-20 by centrality
        ("llm_textrank_keywords", ["term"], ["pr", "rank"]),
        # label-propagation term communities (r13 rebalance: moved
        # home from suite_text_quality — integer/string-exact LPA over
        # the same word co-occurrence graph TextRank walks)
        ("llm_word_communities", ["term", "community"], ["comm_size"]),
    ],
    # streaming batch twins (r10: four standalone driver rows folded
    # into one line — each stays row-level hash-verified through the
    # canonical projection; their unbounded forms are the
    # tests/test_streaming.py replay-parity suite)
    "suite_streaming_batch": [
        ("t3_tumbling_window_batch", ["event_type"],
         ["window_start_us", "pv", "total_value"]),
        ("t3_sliding_window_batch", [], ["window_start_us", "pv"]),
        ("t5_session_window_batch", [],
         ["user_id", "session_start_us", "n_events"]),
        ("t6_interval_attribution_batch", [],
         ["user_id", "purchase_id", "view_id", "view_ts_us",
          "purchase_ts_us", "purchase_value"]),
        # conversion-latency distribution (r10): first-click→purchase
        # latency per day with exact p50/p95 (the a20 percentile
        # convention on top of the t6 interval join)
        ("t20_time_to_convert", ["dt"],
         ["n_conversions", "sum_latency_us", "p50_latency_us",
          "p95_latency_us", "max_touches"]),
        # Theil-Sen robust trend + OLS twin over the daily series
        # (r11): rank-arithmetic median of pairwise slopes — the trend
        # member of the monitoring family (t11 z / t13 MAD / t16 EWMA
        # / t18 CUSUM / t19 seasonality)
        ("t21_theilsen_trend", ["event_type"],
         ["n_days", "n_pairs", "ts_slope", "ols_slope"]),
        # batch twin of the streaming MinHash near-dup gate (r11):
        # keep-first-by-id at the LSH-band level; stream≡batch replay
        # parity incl. kill-restart in test_streaming.py
        ("t22_near_dup_gate", ["dup_near", "keep"], ["doc_id"]),
        # exact-substring gate (r12): keep-first Lee-et-al spans with a
        # window-hash registry as the only state — the substring-
        # granular member of the gate family
        ("t24_exact_span_gate", [],
         ["doc_id", "span_start", "span_end", "span_len"]),
    ],
    # multimodal catalog + frame sampling + Arrow feature extraction
    # (mm_feature_extraction folded in for r9 — the registry must fit
    # the driver's 50-entry verification window, and at 0.3 s it never
    # needed its own bench line)
    "suite_multimodal": [
        ("mm_media_catalog", ["kind", "codec"], ["media_id", "n_bytes"]),
        ("mm_frame_sample", ["kind"], ["media_id", "frame_idx"]),
        # WebDataset-style shard packing by global running byte total
        ("mm_shard_packing", ["kind"],
         ["media_id", "est_bytes", "cum_bytes", "shard"]),
        # Arrow-batched strided-byte features over the fake decode
        ("mm_feature_extraction", ["kind"],
         ["media_id", "n_bytes", "byte_mean", "byte_entropy_proxy",
          "f0", "f1", "f2", "f3", "f4", "f5", "f6", "f7"]),
        # HNSW layered neighbor graph (r11): the vector-modality index
        # build — trailing-zero level draw + per-layer GEMM top-m
        # adjacency, row-for-row verified (the beam-search half stays
        # recall-property-tested). Lives here rather than in
        # suite_graph/suite_embeddings for line balance; the suite
        # union keeps it fully hash-verified either way.
        ("llm_hnsw_graph", [], ["lvl", "src", "dst"]),
        # HNSW beam search (r12): the search half, unrolled to a fixed
        # 8-stage SQL program (entry + per-level beam expansions) —
        # closes the family's last TESTS_ONLY boundary
        ("llm_hnsw_search", [], ["q_id", "n_id", "cos", "rank"]),
        # resize/resample (r13, the last TESTS_ONLY op graduated): the
        # Arrow mapInPandas strided-byte pick, hex-projected so the
        # actual output bytes hash-verify against the DuckDB replay
        ("mm_resize", ["kind", "payload_hex"], ["media_id", "n_bytes"]),
    ],
    # MinHash pipeline: signatures + LSH banding candidates (merged
    # from two standalone rows in r9 for the same 50-entry reason —
    # signature→banding is one logical pipeline, and the suite union
    # keeps both members row-level hash-verified)
    "suite_minhash_lsh": [
        # mh0..mh7 are 10-hex-digit md5 slices — exact as string keys
        ("llm_minhash_signature",
         ["mh0", "mh1", "mh2", "mh3", "mh4", "mh5", "mh6", "mh7"],
         ["doc_id"]),
        ("llm_minhash_lsh_candidates", [], ["doc_a", "doc_b"]),
        # (r13 rebalance: llm_containment_pairs moved to the new
        # suite_pair_blocking — this line measured 11.66 s idle, and
        # containment was its 4.5 s heaviest member)
        # MinHash sketch-accuracy audit (r13 pass 2, from
        # suite_fingerprints): estimate vs exact Jaccard per LSH
        # candidate pair — the pipeline's own diagnostic, oracle-EXACT
        # because the md5mix signatures are deterministic in both
        # engines
        ("llm_minhash_accuracy", [],
         ["doc_a", "doc_b", "n_match", "est_jaccard", "jaccard",
          "abs_err"]),
    ],
    # candidate-pair generation via blocking (r13: split from the
    # over-budget suite_minhash_lsh / suite_dedup_blocking lines —
    # 11.66 / 12.04 s idle vs the ~10 s working ceiling; these two are
    # the same family: bounded pair nomination through a global order
    # window and through asymmetric shingle containment)
    # sequence-packing family (r14): the FFD standalone line (r13)
    # plus the new end-to-end chunk ∘ FFD training-batch pipeline —
    # one registry entry, both members row-level hash-verified, the
    # 50-entry gate cap preserved
    "suite_packing": [
        ("llm_ffd_packing", [],
         ["doc_id", "n_tokens", "pack_grp", "bin_id", "bin_load",
          "n_in_bin", "bin_fill"]),
        # docs → ≤48-token chunks → hard-budget FFD bins: the full
        # training-batch prep story, bin ledger traced to
        # (doc, chunk) sources
        ("llm_batch_prep", [],
         ["doc_id", "chunk_id", "n_tokens", "pack_grp", "bin_id",
          "bin_load", "n_in_bin", "bin_fill"]),
    ],
    "suite_pair_blocking": [
        # sorted-neighborhood blocking (merge/purge window pairs)
        ("llm_sorted_neighborhood", [],
         ["doc_a", "doc_b", "gap", "n_a", "n_b", "inter", "jaccard"]),
        # directed containment (quote/subset) pairs
        ("llm_containment_pairs", [],
         ["doc_a", "doc_b", "n_a", "n_b", "inter", "containment"]),
    ],
}

# Final registry order: SURVEY §2 core families first (scan → predicates
# → aggregates → functions → windows → joins → warehouse → streaming),
# then the LLM-pipeline and multimodal extensions.
FINAL_ORDER: list[str] = [
    "suite_scan_sort",
    "s2_partition_pruned_scan",
    "suite_predicates",
    "suite_subqueries",
    "a1_pricing_summary",
    "a5_conditional_multi_distinct",
    "suite_agg_basic",
    "suite_cube_rollup",
    "dq_audit",
    # (r13: a11_salted_two_phase_agg folded into suite_agg_basic)
    "a18_approx_distinct",
    "a19_groupagg_in_subquery",
    "suite_agg_rewrites",
    "suite_set_ops",
    "suite_scalar_string",
    "suite_math_decode",
    "suite_dates_json",
    "suite_windows_basic",
    "suite_windows_analytic",
    # (r13: w8_funnel_conversion folded into suite_windows_analytic)
    "suite_join_core",
    "j1_six_way_star",
    "j4_broadcast_dims",
    "j5_salted_skew_join",
    "suite_skew_joins",
    "suite_join_misc",
    "j15_asof_join",
    # (r13: scd2_dim_versioning folded into suite_join_misc)
    "suite_tpch",
    "suite_reshape_profiles",
    "x2_predicate_table_join",
    # r10 rebalance: the four streaming batch twins fold into one
    # suite line (each member still row-level hash-verified), freeing
    # three driver slots for suite_graph / suite_fingerprints /
    # suite_corpus_stats — which split the over-budget text/corpus
    # lines instead of hiding their growth
    "suite_streaming_batch",
    "suite_text_quality",
    "suite_fingerprints",
    "suite_corpus_stats",
    "suite_dedup_pairs",
    "suite_dedup_blocking",
    # candidate-pair blocking strategies (r13: the over-ceiling
    # members of suite_minhash_lsh / suite_dedup_blocking, rehomed)
    "suite_pair_blocking",
    "suite_corpus_mix",
    # the end-to-end corpus pipeline is the single heaviest entry (it
    # recomputes the dedup keep-list, contamination scan, repetition,
    # quality band, cap and DSIR weights in one job) — standalone so
    # the driver verifies and the bench times it as its own line
    "llm_corpus_prep",
    "suite_minhash_lsh",
    "llm_ngram_near_dup",
    "llm_simhash_pairs",
    "llm_dedup_clusters",
    "llm_dedup_keep",
    # sequence-packing family (r14: the r13 llm_ffd_packing standalone
    # widened into a two-member suite absorbing the new chunk ∘ FFD
    # batch-prep pipeline — 7 fixed unroll stages each, too heavy for
    # suite_corpus_mix, right-sized as their own line)
    "suite_packing",
    "suite_embeddings",
    # IVF-PQ, the heaviest ANN pipeline, standalone since r13 (pulled
    # from suite_embeddings at 11.21 s idle)
    "llm_ann_ivfpq_grid",
    # PageRank over the near-dup graph — standalone since the r8
    # rebalance (it alone is ~7 s at sf0.1; as its own line a
    # regression is attributable and suite_embeddings stays under the
    # bench ceiling). Also gives the iterative-graph op its own
    # CORRECTNESS row (VERDICT r7 transparency note).
    "llm_pagerank",
    # hybrid BM25→PRF-cosine retrieval cascade (r6 stretch): standalone
    # so the two-stage composition is its own verified + benched line
    "llm_hybrid_retrieval",
    "suite_corpus_ops",
    "suite_graph",
    "suite_multimodal",
]

# The driver's correctness gate verifies at most the first 50 registry
# entries (observed empirically: CORRECTNESS_r08 recorded exactly 50 of
# 53 rows, silently dropping the tail). Every entry MUST sit inside the
# window — enforced by tests/test_suites.py::test_registry_fits_driver_gate.
DRIVER_GATE_CAP = 50

# Raw queries intentionally NOT in the driver registry (no deterministic
# SQL oracle possible — verified by dedicated pytest properties instead):
#   EMPTY since r13 — mm_resize, the last member, graduated to the
#   driver gate (hex-projected strided-byte output vs a DuckDB replay;
#   VERDICT r12 ask #7). History: llm_ann_lsh_topk
#   graduated to the driver gate in r8 (md5-derived hyperplanes make
#   the bucket+rerank path oracle-replayable, queries/llm.py::
#   _lsh_ann_oracle); llm_ann_ivf_topk graduated in r9 (grid-exact
#   k-means quantizer makes index training replayable,
#   _ivf_ann_oracle); llm_ann_ivfpq_topk FOLDED in r10 — the IVF-PQ
#   family's registry verdict is llm_ann_ivfpq_grid (grid-exact,
#   oracle-replayed); the FAISS-shaped cached-index speed variant
#   stays as a plain function (queries/llm.py::llm_ann_ivfpq_topk)
#   with recall + cache-invalidation properties in pytest.
TESTS_ONLY: frozenset[str] = frozenset()


def _canon_spark(
    df: DataFrame, tag: str, keys: list[str], vals: list[str], kw: int, vw: int
) -> DataFrame:
    cols = [F.lit(tag).alias("op")]
    for i in range(kw):
        c = F.col(keys[i]).cast("string") if i < len(keys) else F.lit(None).cast("string")
        cols.append(c.alias(f"k{i + 1}"))
    for i in range(vw):
        c = F.col(vals[i]).cast("double") if i < len(vals) else F.lit(None).cast("double")
        cols.append(c.alias(f"v{i + 1}"))
    return df.select(*cols)


def _suite_query(name: str, members: list[Member], kw: int, vw: int) -> QueryFn:
    builder = FUSED_BUILDERS.get(name)

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        over = builder(spark, sf_dir) if builder is not None else {}

        # guide §2.6 (overlap independent jobs): members that train
        # iteratively (k-means, IVF, BPE, PageRank) materialize with
        # eager localCheckpoints at CONSTRUCTION time — a serial chain
        # of driver-synced jobs whose stage tails leave the cluster
        # idle. The members are independent, so construct them from a
        # small thread pool: the next member's jobs back-fill the
        # executor slots the current one's tail frees. Row content is
        # unaffected (each member's computation is unchanged and
        # deterministic); only the job overlap changes. Pool size 3
        # per the guide — enough to fill tails, not enough to thrash.
        def build(member: Member) -> DataFrame:
            tag, keys, vals = member
            base = over[tag] if tag in over else QUERIES_RAW[tag](spark, sf_dir)
            return _canon_spark(base, tag, keys, vals, kw, vw)

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as pool:
            parts = list(pool.map(build, members))
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out

    return fn


def _canon_sql(raw_sql: str, tag: str, keys: list[str], vals: list[str],
               kw: int, vw: int) -> str:
    sel = [f"'{tag}' AS op"]
    for i in range(kw):
        expr = f"CAST({keys[i]} AS VARCHAR)" if i < len(keys) else "CAST(NULL AS VARCHAR)"
        sel.append(f"{expr} AS k{i + 1}")
    for i in range(vw):
        expr = f"CAST({vals[i]} AS DOUBLE)" if i < len(vals) else "CAST(NULL AS DOUBLE)"
        sel.append(f"{expr} AS v{i + 1}")
    return "SELECT " + ", ".join(sel) + f"\nFROM (\n{raw_sql}\n) AS _m"


def _build() -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for name in FINAL_ORDER:
        if name in SUITES:
            members = SUITES[name]
            missing = [t for t, _, _ in members if t not in QUERIES_RAW]
            if missing:
                raise KeyError(f"suite {name}: unknown members {missing}")
            no_oracle = [t for t, _, _ in members if t not in ORACLES_RAW]
            if no_oracle:
                raise KeyError(f"suite {name}: members without oracle {no_oracle}")
            kw = max(len(k) for _, k, _ in members)
            vw = max(len(v) for _, _, v in members)
            queries[name] = _suite_query(name, members, kw, vw)
            oracles[name] = "\nUNION ALL\n".join(
                _canon_sql(ORACLES_RAW[tag], tag, keys, vals, kw, vw)
                for tag, keys, vals in members
            )
        else:
            if name not in QUERIES_RAW:
                raise KeyError(f"unknown pass-through query: {name}")
            queries[name] = QUERIES_RAW[name]
            if name in ORACLES_RAW:
                oracles[name] = ORACLES_RAW[name]
    return queries, oracles


QUERIES, ORACLES = _build()
