#!/usr/bin/env python
"""Scaling smoke: run the heavy operators at sf0.1 and at a synthetic
REPLICAS× blow-up of it, and report the wall-clock ratio per operator.

The fixtures stop at sf0.1; the design targets 100 TB. This harness
provides the missing measured evidence that the plan shapes actually
scale: each operator's time ratio should track the data ratio (≈
REPLICAS for linear work, lower when fixed overhead dominates) — a
super-linear ratio is a red flag (an all-pairs join, a collect, a
skew cliff) that the small-SF bench cannot see.

Blow-up construction (`/tmp/dw_scale/x{R}`): fact/entity tables are
unioned R times with replica i's id columns offset by i·STRIDE, so
keys stay unique and every join keeps its 1× fan-out; region/nation
are NOT replicated (their keys are referenced unchanged — replicating
them would fan dimension joins out R-fold). documents' text gets a
per-replica suffix token so copies are not R-way EXACT dups; they do
remain near-dups of each other, so cross-replica candidate pairs grow
~R² — the near-dup measurements are therefore an upper bound (a
harder-than-linear workload), which makes a sub-linear result at R×
stronger, not weaker.

Usage:  python scalecheck.py [--replicas 8] [--rebuild]
Prints one JSON line: {"replicas": R, "ops": {name: {"t1": s at 1x,
"tR": s at Rx, "ratio": tR/t1}}}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time

STRIDE = 1_000_000_000
BASE = "/root/testdata/sf0.1"
OUT = "/tmp/dw_scale"

#: id columns to offset per replica, per table (foreign keys offset
#: together so every join keeps its 1x fan-out inside each replica);
#: region/nation are copied once — see module docstring
ID_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

#: operators worth scaling-curves: the shuffle/join/UDF-heavy paths
OPS = [
    "a1_pricing_summary",
    "a5_conditional_multi_distinct",
    "j1_six_way_star",
    # TPC-H multi-way joins: replica ids offset together, so every join
    # keeps its 1x fan-out — ratios should track the data ratio
    "tpch_q5",
    "tpch_q8",
    "w6_ranking",
    "t3_tumbling_window_batch",
    "t5_session_window_batch",
    "llm_exact_dedup",
    "llm_minhash_signature",
    "llm_minhash_lsh_candidates",
    "llm_simhash",
    # span removal: claims strictly-linear cost (no self-join) — the
    # scaling curve is the evidence
    "llm_dup_span_remove",
    "llm_importance_weights",
    "llm_contamination",
    "llm_repetition",
    "llm_stratified_sample",
    # chunking claims zero-shuffle linear cost; domain cap and quality
    # filter claim one domain-partitioned window shuffle (replicas pile
    # all copies into the same 20 domains — the hot-domain stress case)
    "llm_chunk",
    "llm_domain_cap",
    "llm_quality_filter",
    # bigram-LM scoring claims one token-stream shuffle + vocab²-sized
    # model tables; domain KL claims one map-combined token pass with
    # vocab-sized arithmetic after (replicas repeat the same text, so
    # the vocab stays constant while the stream grows — the exact
    # regime where both claims must show sub-linear ratios)
    "llm_lm_perplexity",
    # Kneser-Ney twin: same one-count lineage plus two more window
    # marginals over the same vocab²-bounded table
    "llm_kn_perplexity",
    "llm_domain_kl",
    # domain overlap claims fan-out bounded by domains² per shingle;
    # bm25 claims broadcast-only online scoring over the tf stream;
    # cms claims a fixed d·w keyspace regardless of stream size
    "llm_domain_overlap",
    "llm_bm25_topk",
    "llm_cms_heavy_hitters",
    # PMI shares lm_perplexity's shape: one bigram count + window
    # marginals over the vocab²-bounded table
    "llm_pmi_collocations",
    # RFM windows run over the customers-sized rollup; transitions are
    # one user-partitioned window + a type²-bounded count
    "x5_rfm_segmentation",
    "w10_event_transitions",
    # anomaly scan runs on the types×days rollup after one fact count;
    # the PIT join claims broadcast-dim + residual-range (no fan-out)
    "t11_daily_anomaly_scan",
    # MAD twin: same rollup, two percentile aggs + broadcast joins
    "t13_mad_outlier_scan",
    # incremental view refresh claims one fact-partial agg per side +
    # a view-sized full-outer merge on the group keys
    "a23_incremental_view_refresh",
    # equi-height histogram claims one range shuffle + per-block
    # window + k-row agg — the distributed-global-rank shape
    "dq_equiheight_histogram",
    # column profiler claims ONE expand-based scan (5 count-distincts
    # share it) + a constant 5-row result; table checksum claims one
    # map-combined XOR-fold per table, output bounded by table count;
    # gap fill claims a per-key dense-span explode bounded by the
    # true gap volume plus two linear window passes (reverse-last
    # trick — no O(rows²) forward frame)
    "dq_column_profile",
    "dq_table_checksum",
    "t12_gap_fill",
    # bounded range frame claims one Exchange + O(rows) two-cursor
    # frame evaluation (output = input rows, so linear is the floor);
    # cardinality estimate claims map-combined key rollups before the
    # one ndv-sized exchange + a 16-row agg
    "w11_trailing_range_window",
    # time-weighted average claims ONE (type, day)-keyed shuffle
    # serving both the LOCF lead window and the map-combined final agg
    "t14_time_weighted_avg",
    # compaction planner claims metadata-scale cost (one row per
    # file); replicas multiply the inventory 8x through the same
    # per-day window
    "s16_compaction_plan",
    # CDC collapse claims the S13 window-dedupe shape: one key shuffle
    "s17_cdc_apply",
    # multi-touch attribution claims t6's no-fan-out interval join
    # plus one purchase-keyed window
    "t15_multitouch_attribution",
    "dq_join_cardinality_estimate",
    "j16_pit_dim_join",
    # prefix-filter join claims candidate volume bounded by rare-shingle
    # df² — replicas are mutual near-dups, so true pairs grow ~R² (the
    # documented harder-than-linear upper bound, same as ngram/LSH);
    # sorted-neighborhood claims strictly-linear (window-1)·n pairs;
    # token entropy claims one map-combined distinct-key shuffle
    "llm_prefix_filter_pairs",
    # the CAPPED near-dup fallback (df-capped shingle join) measured on
    # the SAME R²-adversarial replica set — the escape hatch whose
    # number belongs next to prefix-filter's documented output-size
    # boundary (VERDICT r7 ask #7)
    "llm_ngram_near_dup",
    # triangle counting claims wedge volume bounded by Σ out-deg² with
    # out-degree capped at O(√E) by the degree orientation; replicas
    # are mutual near-dups so the pair graph itself grows ~R² — the
    # same documented harder-than-linear upper bound as ngram/LSH
    "llm_graph_triangles",
    "llm_sorted_neighborhood",
    # Ed-Join claims candidate volume bounded by rare-gram prefix df²
    # plus a constant degenerate bucket; replicas are exact key dups,
    # so true pairs grow ~R² (same documented output-size envelope as
    # the other lossless pair joins)
    "llm_edit_distance_pairs",
    "llm_token_entropy",
    # containment shares the capped-self-join envelope (both orders);
    # PPS claims zero data shuffles beyond a scalar reduce; BPE claims
    # corpus-scan-once then vocab-bounded rounds (replicated text keeps
    # the vocab constant while the scan grows — the flat-rounds regime)
    "llm_containment_pairs",
    "llm_pps_sample",
    "llm_bpe_merges",
    # hybrid retrieval claims the BM25 offline-index cost plus ONE
    # broadcast-gated embedding pass (candidate set is O(q·k_cand),
    # constant in corpus size — the ratio should track the BM25 stage)
    "llm_hybrid_retrieval",
    # zipf claims word-count map-combine + vocab-only window (replicas
    # repeat the text so the vocab — and the regression — stay
    # constant while the scan grows: the flat-tail regime); source mix
    # claims one slice-count + broadcast accept (zero data shuffles);
    # calibration claims one slice-fit reduce + one scoring pass
    "llm_zipf_slope",
    "llm_source_mix",
    "llm_quality_calibration",
    # shard packing claims a linear global running total via the
    # block-offset pattern (range shuffle + per-block window + a
    # broadcast n_blocks-row prefix table) — no single-partition
    # window to collapse under 64× the rows
    "mm_shard_packing",
    # cluster-balanced sampling claims the kmeans iteration cost
    # (centroid table is n_cells×dim regardless of corpus) plus one
    # cluster-keyed quota window — replicas multiply cluster sizes,
    # not cluster count, so the window is the part under test
    "llm_cluster_balanced_sample",
    # curriculum claims lm_score's one bigram pass (vocab² model,
    # constant under replicated text) + the block-offset global rank
    # (one range shuffle of id/ppl rows, no single-partition window)
    "llm_curriculum",
    # r8 corpus-lifecycle ops: bloom claims a constant-size broadcast
    # filter + one doc_id shuffle (replicated text keeps the distinct
    # shingle set — and the filter — constant while probes grow);
    # corpus_diff claims one id-keyed full-outer of 16-byte prints;
    # reservoir claims a TakeOrdered top-N (no global sort); the ANN
    # quality eval claims two top-k searches + a broadcast-trivial
    # metrics join (queries fixed, corpus grows only the search side);
    # sq8 claims one posexplode map-combine to a dim-sized range table
    # + one id-keyed rollup
    "llm_bloom_contamination",
    "llm_corpus_diff",
    "llm_reservoir_sample",
    "llm_ann_quality",
    "llm_sq8_quantize",
    # r8 paragraph-granularity cleaning pair: paragraph_dedup claims
    # one min-struct agg on 8-byte block hashes + one keeper join +
    # one doc_id rollup (the replica suffix token keeps cross-replica
    # blocks distinct in the tail block only, so the block table grows
    # ~linearly); boilerplate claims a distinct+count on (source,
    # hash) and a broadcast-sized anti join (the frequent set is the
    # hot-string set, constant-ish under replication)
    "llm_paragraph_dedup",
    "llm_boilerplate_blocks",
    # r9 grid-exact IVF ANN (the driver-gated variant): claims per
    # Lloyd iteration one corpus scan + a k·dim re-mean shuffle, then
    # a cell-keyed hash join touching ~n_probe/n_cells of the corpus
    # (queries fixed) — ratio should sit well below the data ratio
    # because the probe fraction and the query set are constant
    "llm_ann_ivf_topk",
    # r9 grid IVF-PQ: adds per-iteration one Arrow encode scan + a
    # codebook-sized re-mean sync on top of the IVF claim; the ADC
    # rollup is candidates×m rows (candidates = probed fraction)
    "llm_ann_ivfpq_grid",
    # bitmap exact-distinct claims a map-combined (type, word) agg —
    # replicas widen the user-id space, so the word table grows
    # linearly while the duplicate events per word combine map-side
    "a24_bitmap_distinct",
    # MATCH_RECOGNIZE claims ONE user_id shuffle + map-side regex —
    # replicas add users (more partitions), never longer sequences,
    # so no per-user state growth and no window rescan
    "w12_match_recognize",
    # windowed count-distinct rewrite claims one user_id Exchange with
    # per-row state bounded by the type domain (5); LOCF ignore-nulls
    # claims the same single Exchange + linear frame walk
    "w13_windowed_count_distinct",
    "w14_locf_ignore_nulls",
    # EWMA claims a types×days rollup of one map-combined fact scan;
    # the 8 lags run in one Window operator over the rollup only
    "t16_ewma_smoothing",
    # higher-order array functions claim a pure codegen projection —
    # zero shuffles, the scan is the whole cost
    "f14_higher_order_arrays",
    # --- round-10 additions ---
    # k-core claims per-round degree counts + two semi-joins on a pair
    # graph that itself grows ~R² under mutually-near-dup replicas
    # (the same documented adversarial envelope as triangles)
    "llm_graph_kcore",
    # TextRank claims pagerank iterations over the vocab²-bounded word
    # graph — replicated text keeps the graph CONSTANT while the
    # bigram scan grows: the flat-iterations regime
    "llm_textrank_keywords",
    # session paths claims one user-keyed session shuffle + a
    # path-count map-combine; churn claims two pushdown-pruned scans +
    # one anti-join; ABC claims the distributed global cumsum (range
    # shuffle + block-offset lift, no single-partition window)
    "x6_session_paths",
    "x7_churn_detection",
    "x8_abc_analysis",
    # Hilbert claims the zorder envelope: one scalar min/max broadcast
    # + a pure codegen projection (8 unrolled integer iterations)
    "s18_hilbert_clustering",
    # Benford claims one 9-key map-combined count + a scalar total;
    # k-anonymity one QI-key aggregate; l-diversity two chained
    # aggregates over class tables ≪ rows
    "dq_benford",
    "dq_k_anonymity",
    "dq_l_diversity",
    # minhash accuracy claims the signature+banding envelope with the
    # in-row exact verify — candidates grow ~R² under near-dup
    # replicas (the documented LSH output-size upper bound)
    "llm_minhash_accuracy",
    # --- r11 roster (manual 8×/10× sweeps in SCALE.md; kept here so
    # future rounds re-measure them with one command) ---
    # market basket claims Σ C(basket,2) pair volume: replica ids
    # offset together so pair families stay disjoint — linear
    "a26_market_basket",
    # Theil-Sen claims calendar-bounded per-series pairs: replicated
    # events keep the SAME event types, so the series count is
    # constant and only the daily rollup scan grows — near-flat
    "t21_theilsen_trend",
    # the near-dup gate claims one signature pass + one band groupBy
    # (no pair materialization): replicated identical texts make every
    # copy share bands with the min-id original — the adversarial
    # all-dup regime, still linear because the gate never joins pairs
    "t22_near_dup_gate",
    # FD audit claims one map-combined groupBy per FD; offset ids
    # multiply group counts linearly
    "dq_fd_audit",
    # LPA claims O(E) per fixed round over the vocab²-bounded word
    # graph — replicated text keeps the graph constant (textrank's
    # flat-iterations regime)
    "llm_word_communities",
    # the HNSW gate claims bounded-collect dense GEMM under the cap
    # and occupancy-pinned per-bucket GEMM above it; replicas shift
    # ids only, so vectors repeat and buckets carry exact copies
    "llm_hnsw_graph",
    # join-IVM claims retraction anti-join + broadcast delta re-join;
    # o_custkey and c_custkey offset together so the join keeps 1x
    # fan-out per replica
    "a27_incremental_join_refresh",
    # --- r12 roster ---
    # the verify-then-drop gate adds an exact-Jaccard check over the
    # band-bounded candidate pairs: replicated identical texts are the
    # all-dup adversarial regime (every copy collides with the min-id
    # original AND verifies at J=1), so candidates grow with the dup
    # family sizes — the documented trade vs t22's band-only decision
    "t23_near_dup_gate_verified",
    # exact substring dedup claims linear positional-window hashing +
    # one frequency agg (no self-join); the replica suffix token makes
    # cross-replica windows distinct while within-replica repeats
    # survive verbatim — work grows exactly R×
    "llm_exact_dup_spans",
    # keep-first twin (the t24 streaming gate's batch form): same
    # window pass + a min-site agg instead of a count — same claim
    "t24_exact_span_gate",
    # HNSW beam search claims (max_level+1)·steps bounded frontier
    # joins; replicated vectors grow the graph/build linearly while
    # the query set stays pinned (vec_id < 8), so the beam stages are
    # constant-size and only the build scales
    "llm_hnsw_search",
    # --- r13 roster ---
    # FFD packing claims ONE block-offset global rank (range shuffle,
    # no single-partition window) + 7 fixed unroll stages whose
    # per-stage volume is n/group_size rows joined against
    # ≤ group_size-row per-group bin tables — every stage linear in
    # the corpus, stage COUNT constant, so the ratio should track the
    # data ratio with the fixed 8-job overhead amortizing away
    "llm_ffd_packing",
    # --- r14 roster ---
    # the rolling-hash impl twin claims the SAME linear window-pass +
    # frequency-agg shape as llm_exact_dup_spans with the O(L) md5
    # constant replaced by O(1) Rabin-Karp updates in one mapInPandas
    # pass — the replica suffix token keeps cross-replica windows
    # distinct, so work grows exactly R× and the ratio should sit at
    # or under the md5 twin's
    "llm_exact_dup_spans_rolling",
    # chunk ∘ FFD batch prep claims the chunker's zero-shuffle fan-out
    # (≈2× rows at 48-token pieces) feeding the same block-offset rank
    # + 7 fixed unroll stages as llm_ffd_packing — linear volume,
    # constant stage count, so the ratio should match the FFD twin's
    # fixed-overhead-dominated envelope
    "llm_batch_prep",
    # r14 optimization-round rewrites not previously on the roster —
    # each changed an operator's physical shape (fewer joins / UDF →
    # aggregate() lambda / shared checkpoint), so the 8× curve is the
    # evidence the new shape stays linear:
    # pagerank: degree folded into the edge table, 1 join/iteration
    "llm_pagerank",
    # CUSUM recurrence: applyInPandas → sort_array + aggregate() lambda
    "t18_cusum_changepoint",
    # new-batch + hot-shingle tables pinned (work ∝ increment claim)
    "llm_incremental_dedup",
    # BPE merge loop: per-round collect-argmax → lazy broadcast joins
    "llm_bpe_segment",
    "llm_tokenizer_fertility",
    # simhash near-dup: one checkpointed signature table feeds both
    # self-join sides (ArrowEvalPython 8 → 0)
    "llm_simhash_pairs",
    # attribution family: t6/t20 (and t15/t17 via ranks) now derive
    # from one shared interval-join pair table
    "t6_interval_attribution_batch",
    "t20_time_to_convert",
    "t17_position_attribution",
]


def build(spark, replicas: int, dest: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(dest, exist_ok=True)
    for name in ("region", "nation"):
        spark.read.parquet(f"{BASE}/{name}.parquet") \
            .write.mode("overwrite").parquet(f"{dest}/{name}.parquet")
    for name, ids in ID_COLS.items():
        src = spark.read.parquet(f"{BASE}/{name}.parquet")
        parts = []
        for i in range(replicas):
            p = src
            for c in ids:
                p = p.withColumn(c, F.col(c) + F.lit(i * STRIDE))
            if name == "documents" and i > 0:
                # new replica ≠ exact dup of replica 0, but still a
                # near-dup of it — preserves dedup candidate structure
                p = p.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" r{i}"))
                )
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{dest}/{name}.parquet")
    # marker LAST: a crashed build leaves no marker and is rebuilt
    with open(f"{dest}/_BUILD_COMPLETE", "w") as fh:
        fh.write(str(replicas))


def time_ops(spark, sf_dir: str, reps: int = 2,
             ops: list[str] | None = None) -> dict[str, float]:
    from datawarehouse_spark.queries import QUERIES_RAW

    t: dict[str, float] = {}
    for name in (ops if ops is not None else OPS):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            # no count() fallback: a failed noop write must FAIL the
            # harness, not silently time a different execution
            QUERIES_RAW[name](spark, sf_dir) \
                .write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        t[name] = round(best, 3)
    return t


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=8)
    ap.add_argument("--rebuild", action="store_true")
    ap.add_argument("--ops", type=str, default=None,
                    help="comma-separated subset of OPS to measure "
                         "(default: the full roster)")
    args = ap.parse_args()
    ops = args.ops.split(",") if args.ops else OPS
    unknown = [o for o in ops if o not in OPS]
    if unknown:
        raise SystemExit(f"not in OPS roster: {unknown}")

    from datawarehouse_spark.session import get_spark

    spark = get_spark(app_name="dw-scalecheck")
    dest = f"{OUT}/x{args.replicas}"
    if args.rebuild and os.path.isdir(dest):
        shutil.rmtree(dest)
    if not os.path.isfile(f"{dest}/_BUILD_COMPLETE"):
        if os.path.isdir(dest):  # partial build from a crashed run
            shutil.rmtree(dest)
        build(spark, args.replicas, dest)

    # warm-up: JIT/codegen at the smallest SF so t1 isn't cold-start
    time_ops(spark, "/root/testdata/sf0.001", reps=1, ops=ops)
    t1 = time_ops(spark, BASE, ops=ops)
    tR = time_ops(spark, dest, ops=ops)
    print(json.dumps({
        "replicas": args.replicas,
        "ops": {
            n: {"t1": t1[n], "tR": tR[n],
                "ratio": round(tR[n] / max(t1[n], 1e-9), 2)}
            for n in ops
        },
    }))


if __name__ == "__main__":
    main()
