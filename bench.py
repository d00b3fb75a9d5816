#!/usr/bin/env python
"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ..., "host_load_index": ...,
"control_sec": ..., "value_normalized": ...}.

host_load_index ~1.0 means the host was quiet and raw times are
trustworthy; >1.3 means ambient load inflated them — prefer
value_normalized (first-order correction) and re-measure perf claims
on a quiet host. Full per-query raw AND normalized detail goes to
stderr (the stdout line must fit the driver's 2000-byte tail window).

Each query is forced to full execution with a noop-format write (all
work, no sink cost). Every query gets one untimed warmup run first:
whole-stage codegen compilation of the expression-heavy sketch queries
is a one-time ~tens-of-seconds JVM cost (Janino), and the benchmark
measures the plan's steady-state throughput, not compiler startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkifydb_datawarehouse_spark import registry
from sparkifydb_datawarehouse_spark.session import get_spark

HEADLINE = [
    "q_flagship_revenue_by_region",  # 5-table broadcast star join + agg
    "q_agg_groupby",                 # full-accumulator hash agg (TPC-H Q1 shape)
    "q_agg_rollup",                  # Expand-based multi-level agg
    "q_join_range",                  # equi-join + residual range predicate
    "q_join_left",                   # outer join
    "q_window_rank",                 # shuffle + per-partition sort window
    "q_topk_per_group",              # window top-k
    "q_sort_limit",                  # TakeOrderedAndProject
    "q_dedup_exact",                 # fingerprint groupBy
    # NOTE bench history: r7 entries = production sketch only; r8 =
    # + full-corpus exact-truth audit (6.0/7.0 s); r9 = same contract,
    # truth bounded to the 500-doc anchor slice (~2.6/3.2 s) — the
    # r7->r8->r9 deltas are workload redefinitions (SCALING.md (ab))
    "q_dedup_fuzzy_minhash",         # LSH band self-join + anchored exact-truth audit
    "q_dedup_simhash",               # bit-vote sketch buckets + anchored exact-truth audit
    "q_dedup_clusters",              # iterative connected components
    "q_similarity_topk",             # brute-force cosine scan
    "q_similarity_batch_knn",        # bucketed all-pairs kNN
    "q_similarity_ivf",              # IVF coarse-quantizer ANN
    "q_text_quality",                # expression-heavy per-doc scoring
    "q_text_tfidf",                  # tokenize + two aggs + broadcast join
    "q_sample_hash",                 # deterministic hash sample (scan filter)
    "q_profile_columns",             # one-pass multi-column profile
    "q_stream_tumbling",             # event-time windowed agg (batch plan)
    "q_stream_stream_join",          # watermarked interval join (batch plan)
    "q_sparkify_songplays",          # reference-parity 3-key JSON join
    "q_tpch_q3_shipping_priority",   # 3-way join + agg + top-k composite
    "q_tpch_q10_returned_items",     # 4-way join + agg + top-k composite
    "q_tpch_q1_pricing_summary",     # scan-bound full agg
    "q_tpch_q5_local_supplier",      # 6-table star join
    "q_tpch_q6_forecast_revenue",    # pure pushdown scan + scalar agg
    "q_tpch_q18_large_customers",    # aggregate-then-semijoin
    "q_tpch_q2_min_cost_supplier",   # correlated per-part MIN + dim decoration
    "q_tpch_q4_order_priority",      # EXISTS semi-join with date residual
    "q_tpch_q7_volume_shipping",     # double-nation star join, both directions
    "q_tpch_q9_product_profit",      # 4-way join + profit agg by nation/year
    "q_tpch_q13_customer_distribution",  # outer-join two-level histogram
    "q_tpch_q17_small_quantity",     # correlated per-part AVG window filter
    "q_tpch_q21_waiting_suppliers",  # EXISTS + NOT EXISTS self-joins on one shuffle
    "q_sessionize_gap",              # two-window sessionization, one shuffle
    "q_cohort_retention",            # cohort matrix (two aggs + distinct)
    "q_kmeans_embeddings",           # iterative Lloyd, codegen argmin
    "q_variant_json",                # parse_json -> VARIANT -> typed gets
    "q_dq_referential",              # three anti-join audits in one plan
    "q_asof_join",                   # join + window as-of composition
    "q_merge_upsert",                # full-outer-join upsert
    "q_cdc_apply",                   # change-log fold via max_by agg
    "q_join_fuzzy_levenshtein",      # deletion-neighborhood linkage join (r7)
    "q_join_jaro_winkler",           # prefix-filtered JW linkage join (r7)
    "q_join_interval_overlap",       # per-key interval overlap join
    "q_graph_triangles",             # edge-gen self-join + two-hop close
    "q_graph_pagerank",              # iterative rank propagation
    "q_ts_interpolate",              # gap fill + two-direction window interp
    "q_anomaly_zscore",              # 200-row trailing window score
    "q_table_diff",                  # full-outer hash-vs-hash snapshot diff
    "q_feature_binning",             # NTILE decile features + per-bin stats
    "q_sample_weighted",             # per-row weighted hash sample
    "q_dedup_representative",        # keep-best-per-fingerprint max_by
    "q_pattern_sequence",            # journey-string regex conversions
    "q_drift_psi",                   # one-scan two-slice PSI
    "q_udaf_trimmed_mean",           # GROUPED_AGG pandas UDAF
    "q_window_time_range",           # trailing INTERVAL 1h RANGE frame
    "q_pit_join",                    # SCD2 point-in-time containment join
    "q_masked_view",                 # governed view: mask + RLS pushdown
    "q_text_repetition",             # repeated 3-gram share per doc
    "q_corpus_funnel",               # exact->near dedup funnel, staged counts
    "q_ts_ohlc",                     # struct-extrema candle downsample
    "q_rollup_timebucket",           # hypertable hour/day/series grouping sets
    "q_agg_skew_kurt",               # power-sum moment statistics
    "q_global_rownumber",            # range-partitioned global enumeration
    "q_text_unigram_logprob",        # LM quality scoring, broadcast vocab
    "q_islands_consecutive",         # gaps-and-islands day streaks
    "q_keyset_pagination",           # cursor page: pushdown + top-k
    "q_agg_robust_stats_approx",     # two-pass t-digest MAD (bounded-state)
    "q_text_chunking",               # map-only sliding-window chunker
    "q_dedup_ngram_jaccard",         # exploded-intersection exact jaccard
    "q_skew_diagnostics",            # per-key skew profile agg
    "q_ks_two_sample",               # ECDF via two-phase range prefix scan
    "q_gini_concentration",          # range-enumerated rank-weighted sum
    "q_basket_pairs",                # in-expression pair-gen + lift
    "q_rfm_segments",                # triple-ntile segmentation on aggregates
    "q_greedy_allocation",           # per-key cumulative allocation window
    "q_geo_nearest",                 # fine-grid branch-and-bound NN join (r7)
    "q_event_trigrams",              # in-buffer journey sort + array grams
    "q_regression_slope",            # grouped OLS sufficient statistics
    "q_cohort_ltv",                  # integer-cents cohort curves
    "q_open_orders_daily",           # sweep-line interval integration
    "q_kaplan_meier",                # survival curve, exp-sum-ln product
    "q_last_touch_attribution",      # IGNORE-NULLS navigation window
    "q_dedup_containment",           # inverted-index containment join, df cap
    "q_multitouch_attribution",      # bounded RANGE frame + fixed-point credit
    "q_grouped_regression",          # per-key OLS, one sufficient-stats agg
    "q_ts_acf",                      # daily fold + multi-lag window + corr
    "q_ann_recall",                  # recall@k QA harness (7 top-k subplans)
    "q_similarity_pq",               # product-quantization ADC search
    "q_multimodal_decode_ppm",       # real PPM decode via mapInPandas
    "q_dedup_prefix_filter",         # PPJoin exact similarity self-join
    "q_agg_count_min",               # CMS frequency sketch + contract
    "q_join_bloom_prefilter",        # Bloom semi-join pruning + contract
    "q_bootstrap_ci",                # one-pass Poisson bootstrap
    "q_map_in_arrow",                # Arrow RecordBatch tier
    "q_dedup_lsh_verified",          # two-tier LSH candidates -> exact verify
    "q_multimodal_decode_png",       # stdlib-zlib PNG inflate + unfilter
    "q_text_bm25",                   # map-only BM25 scan + 6-scalar stats row
    "q_search_rrf_fusion",           # hybrid lexical+vector RRF fuse
    "q_text_cdc_chunks",             # content-defined chunking dedup
    "q_agg_kmv_overlap",             # KMV sketch set algebra + contract
    "q_sample_dsir",                 # DSIR importance weighting toward a target domain
    "q_multimodal_decode_jpeg",      # pure-Python baseline JPEG decode
    "q_multimodal_decode_jpeg_arith",  # r9: SOF9 QM-coder decode
    "q_multimodal_decode_jpeg_prog_arith",  # r9: SOF10 progressive QM decode (VERDICT r9 #3: ~4.4 s sf0.1, the registry's most expensive new query must not hide from the headline)
    "q_multimodal_decode_webp_lossy",  # r10: VP8 intra-frame decode (last codec gate closed)
    "q_multimodal_decode_webp_alpha",  # r10: ALPH alpha chunk (RGBA still)
    "q_multimodal_decode_webp_anim",  # r10: ANMF animation frames (VP8+VP8L alternating)
    "q_dedup_image_phash",  # r10: perceptual-hash image dedup (decode -> dHash -> cluster)
    "q_text_kneser_ney",  # r11: interpolated-KN bigram scoring (map-side pairs, no token shuffle)
    "q_multimodal_decode_qoi",  # r11: QOI lossless decode (interop-complete, no tuned tables)
    "q_tokenizer_unigram_lm",  # r11: SentencePiece-style unigram-LM hard-EM training
    "q_multimodal_decode_tiff",  # r11: baseline TIFF (dual endian, PackBits, strips)
    "q_multimodal_decode_flac",  # r11: FLAC Rice/fixed-predictor decode (compressed audio)
    "q_text_novelty",                # cross-doc duplication rate (gram-key window)
    "q_graph_link_prediction",       # neighborhood-Jaccard, degree-capped pair volume
    "q_hard_negatives",              # closure-anchor contrastive mining (one Arrow pass)
    "q_session_window_batch",        # engine-native session aggregation
    "q_dedup_incremental",           # batch-vs-index fingerprint anti-join
    "q_text_readability",            # map-only Flesch / FK grade
    "q_text_substring_dedup",        # cross-doc exact-span coverage (Lee et al.)
    "q_text_substring_scrub",        # first-occurrence-wins span removal
    "q_sample_group_split",          # leakage-safe group-hash split
    "q_scan_avro_logical",  # r12: logical-typed Avro estate roundtrip (two-phase sink write + per-file decode)
    "q_scan_arrow_ipc",  # r12: Arrow IPC/Feather estate (dictionary col, lz4/zstd rotation)
    "q_tokenizer_wordpiece",  # r12: greedy longest-match WordPiece (recursive-CTE-oracled)
    "q_rank_metrics",  # r12: nDCG/MRR/recall@k retrieval evaluation
    "q_tokenizer_fertility",  # r12: per-language fertility under the shared vocab
    "q_snapshot_changes",  # r12: CDC change feed off the snapshot manifests
    "q_snapshot_delete_mor",  # r13: merge-on-read delete (broadcast sidecar anti-join)
    "q_snapshot_zorder_read",  # r13: 2-dim z-order stats-pruned read
    "q_tokenizer_oov",  # r13: apply-time [UNK] rate under a 5% train slice
    "q_snapshot_merge_upsert",  # r13: stats-pruned COW MERGE read-back
]


# Host-noise defense (round-4, VERDICT r3 #1): the shared harness host
# has twice distorted the official BENCH artifact (r2 parse truncation,
# r3 a 1.49x phantom regression from ambient load). The bench now
# carries its own load probe: a DATA-INDEPENDENT synthetic control —
# 1e9-row range -> xxhash64 -> sum, pure CPU across 32 tasks, zero IO,
# zero dependence on repo code or scale factor — timed before, between,
# and after the interleaved passes. host_load_index = median(control) /
# QUIET_CONTROL_SEC; ~1.0 on a quiet host, rises with contention.
# Compare bench rounds on raw times only when the index is ~1; else
# divide by the index for a first-order correction.
# The 0.43 s pin is THIS host's quiet CPU cost (min-of-5, load avg 0.6,
# 2026-08-14); on different hardware the index would conflate machine
# speed with ambient load, so it is overridable — and control_sec (the
# raw median) is always emitted for per-host baselining (ADVICE r4).
QUIET_CONTROL_SEC = float(os.environ.get("SPARK_GRAFT_QUIET_CONTROL", "0.43"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all_modules()
    spark = get_spark("sparkifydb-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        t0 = time.perf_counter()
        registry.QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    def run_control() -> float:
        t0 = time.perf_counter()
        (
            spark.range(0, 1_000_000_000, 1, 32)
            .selectExpr("sum(xxhash64(id) % 1000003) as s")
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        return time.perf_counter() - t0

    def run_mem_control() -> float:
        # Second control axis (round 11, VERDICT r10 #2): the 1e9-row
        # xxhash probe is pure-ALU and provably missed the r8→r10 host
        # slowdown (a same-host worktree A/B showed the r8 CODE reading
        # 1.17-1.46× its r8-recorded values while the xxhash control sat
        # at the 0.43 s quiet pin in both eras — BASELINE.md r11 row).
        # This probe is allocation/memory-bandwidth-bound (per-row string
        # materialization), the class Spark query work actually lives
        # in. Quiet pin on this host: ~0.71 s (min-of-5, 2026-08-16).
        t0 = time.perf_counter()
        (
            spark.range(0, 40_000_000, 1, 32)
            .selectExpr("sum(length(repeat(cast(id as string), 8))) as s")
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        return time.perf_counter() - t0

    for name in HEADLINE:  # warmup: JVM, codegen compile, file index
        run(name)
    run_control()  # warmup the controls' codegen too
    run_mem_control()

    # min over 3 INTERLEAVED passes (A,B,C,A,B,C — not A,A,A): a load
    # spike confined to one wall-clock interval can no longer sit on
    # all three samples of the same query, so min-of-passes recovers
    # the quiet cost unless contention spans the whole bench.
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    controls = [run_control()]
    mem_controls = [run_mem_control()]
    for _ in range(3):
        for name in HEADLINE:
            samples[name].append(run(name))
        controls.append(run_control())
        mem_controls.append(run_mem_control())
    timings = {name: round(min(ts), 3) for name, ts in samples.items()}
    ctrl = sorted(controls)[len(controls) // 2]  # median of 4
    mem_ctrl = sorted(mem_controls)[len(mem_controls) // 2]
    host_load_index = round(ctrl / QUIET_CONTROL_SEC, 2)

    # Full-precision detail to stderr for humans; stdout gets ONE compact
    # JSON line. The driver keeps only the last ~2000 bytes of stdout and
    # json-parses them (BENCH_r02 recorded "parsed": null because the line
    # overflowed that window), so the stdout line is emitted with compact
    # separators, 2-decimal timings, and a fit-guard: if it still exceeds
    # the window, the fastest entries are folded out of the map (their cost
    # stays in "value"; the drop is counted in "queries_omitted" — no
    # silent cap).
    detail = {
        "detail": timings,
        "detail_normalized": {
            n: round(s / max(host_load_index, 0.01), 3) for n, s in timings.items()
        },
        "control_samples": [round(c, 3) for c in controls],
        "mem_control_samples": [round(c, 3) for c in mem_controls],
        "host_load_index": host_load_index,
    }
    print(json.dumps(detail, sort_keys=True), file=sys.stderr)

    compact = {name: round(sec, 2) for name, sec in timings.items()}
    total = round(sum(timings.values()), 3)

    def encode(queries: dict, omitted: int) -> str:
        result = {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": queries,
            "sf": sf_dir,
            "host_load_index": host_load_index,
            "control_sec": round(ctrl, 3),
            "mem_control_sec": round(mem_ctrl, 3),
            "value_normalized": round(total / max(host_load_index, 0.01), 1),
        }
        if omitted:
            result["queries_omitted"] = omitted
        return json.dumps(result, separators=(",", ":"))

    TAIL_WINDOW = 1950  # driver captures the last 2000 bytes of stdout;
    # this line is the final stdout output, so only its own length counts
    by_cost = sorted(compact, key=compact.get, reverse=True)
    keep = len(by_cost)
    line = encode({n: compact[n] for n in by_cost[:keep]}, len(by_cost) - keep)
    while len(line) > TAIL_WINDOW and keep > 0:
        keep -= 1
        line = encode({n: compact[n] for n in by_cost[:keep]}, len(by_cost) - keep)
    print(line)


if __name__ == "__main__":
    main()
