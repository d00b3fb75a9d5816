"""Empty-input robustness: every composable operator must return an
EMPTY result (same schema), not crash, when its input has no rows —
at 100 TB, empty slices/partitions/deltas are routine (a new tenant,
a quiet hour, a filter that matches nothing)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empty_events(spark):
    return spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_cdc_apply_empty(spark):
    from sparkifydb_datawarehouse_spark.operators.cdc import apply_cdc

    empty = spark.createDataFrame(
        [], "key long, seq_ts timestamp, seq_id long, op string,"
        " price double, status string"
    )
    out = apply_cdc(empty)
    assert out.count() == 0
    assert set(out.columns) == {"key", "last_op", "last_price", "last_status", "n_changes"}


def test_snapshot_diff_empty_sides(spark):
    from sparkifydb_datawarehouse_spark.operators.diffing import snapshot_diff

    empty = spark.createDataFrame([], "k long, v double")
    full = spark.createDataFrame([(1, 1.0)], "k long, v double")
    assert snapshot_diff(empty, empty, "k").count() == 0
    # one-sided: everything classified, nothing dropped
    assert {r["change"] for r in snapshot_diff(empty, full, "k").collect()} == {"added"}
    assert {r["change"] for r in snapshot_diff(full, empty, "k").collect()} == {"removed"}


def test_connected_components_empty(spark):
    from sparkifydb_datawarehouse_spark.llm.clustering import connected_components

    edges = spark.createDataFrame([], "a long, b long")
    assert connected_components(edges, "a", "b").count() == 0


def test_pagerank_empty(spark):
    from sparkifydb_datawarehouse_spark.operators.graph import pagerank

    edges = spark.createDataFrame([], "src long, dst long")
    assert pagerank(edges).count() == 0


def test_interpolate_and_zscore_empty(spark, monkeypatch, empty_events):
    from sparkifydb_datawarehouse_spark.operators import resample as R

    monkeypatch.setattr(R, "load_table", lambda *_a, **_k: empty_events)
    assert R.ts_interpolate(spark, "x").count() == 0
    assert R.anomaly_zscore(spark, "x").count() == 0


def test_pattern_sequence_empty(spark, monkeypatch, empty_events):
    from sparkifydb_datawarehouse_spark.operators import sequences as SQ

    monkeypatch.setattr(SQ, "load_table", lambda *_a, **_k: empty_events)
    assert SQ.pattern_sequence(spark, "x").count() == 0


def test_kmeans_empty_returns_empty(spark):
    """k-means on an empty slice has no centroids to seed — it now
    returns the empty assignment with the contract schema (this
    module's policy) instead of feeding the numpy kernel a 0-d model
    (the registry-wide empty audit caught the old AxisError)."""
    from sparkifydb_datawarehouse_spark.llm.clustering import kmeans_fit_assign

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = kmeans_fit_assign(empty, dim=4)
    assert out.count() == 0
    assert out.columns == ["vec_id", "cluster"]


def test_kmeans_query_empty_returns_zero_rows(spark, empty_sf_dir):
    """ADVICE r6: the registered q_kmeans_embeddings contract query on
    an empty slice must be empty-out (0 rows), not one all-NULL row
    from the groupless-agg cross join — its oracle now carries the
    matching WHERE EXISTS guard."""
    from sparkifydb_datawarehouse_spark import registry

    registry.load_all_modules()
    out = registry.QUERIES["q_kmeans_embeddings"](spark, empty_sf_dir)
    assert out.count() == 0
    assert out.columns == [
        "n_points",
        "k",
        "total_ss",
        "multiple_clusters_used",
        "within_ss_below_total",
    ]


def test_round3_helpers_empty(spark):
    """Round-3 composable helpers on empty inputs: empty out, right
    schema, no crash."""
    from sparkifydb_datawarehouse_spark.llm import dedup
    from sparkifydb_datawarehouse_spark.llm.chunking import text_chunking  # noqa: F401

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert dedup.minhash_band_pairs(empty_docs).count() == 0
    assert dedup.simhash_pairs(empty_docs, widened=False).count() == 0
    assert dedup.simhash_pairs(empty_docs, widened=True).count() == 0
    assert dedup.simhash_sketch(empty_docs).count() == 0

    from sparkifydb_datawarehouse_spark.llm.textstats import _segments

    seg = _segments(empty_docs)
    assert seg.count() == 0
    assert set(seg.columns) == {"doc_id", "segment"}


def test_chunking_single_token_doc(spark):
    """A 1-token doc must yield exactly one 1-token chunk (the stride
    guard's lower bound)."""
    from pyspark.sql import functions as F

    from sparkifydb_datawarehouse_spark.llm import chunking as C

    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    docs = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    base = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") > 0)
    out = base.select(
        "doc_id", F.explode(F.expr(C._STARTS)).alias("start")
    ).collect()
    assert [r["start"] for r in out] == [0]


def test_ranged_enumerate_empty_and_single(spark):
    """The two-phase range enumeration (shared by KS/Gini) must handle
    zero and one row: empty in → empty out (no crash on the empty
    offsets table), single row → rank 1."""
    from sparkifydb_datawarehouse_spark.operators.stats_tests import _ranged_enumerate

    empty = spark.createDataFrame([], "x double, k long")
    assert _ranged_enumerate(empty, ["x", "k"], 8).count() == 0
    one = spark.createDataFrame([(1.5, 7)], "x double, k long")
    rows = _ranged_enumerate(one, ["x", "k"], 8).collect()
    assert len(rows) == 1 and rows[0]["_rank"] == 1


def test_bfs_single_vertex_frontier_terminates(spark):
    """connected BFS loop: a frontier that immediately empties (no
    edges from source side) must terminate at depth 0 output only."""
    from pyspark.sql import functions as F

    # degenerate bi graph: one self-contained edge pair, source = 1
    bi = spark.createDataFrame([(1, 2), (2, 1)], "u long, v long")
    dist = spark.createDataFrame([(1, 0)], "v long, d int")
    nxt = (
        dist.join(bi, dist.v == bi.u)
        .select(bi.v.alias("v"))
        .distinct()
        .join(dist, "v", "left_anti")
    )
    assert nxt.count() == 1  # vertex 2 discovered, then loop would stop


# ---------------------------------------------------------------------------
# Registry-level empty-slice gate: a one-off audit ran EVERY registered
# query against an all-empty fixture dir (284/287 passed; the three
# crashes — ANSI divide-by-zero in the referential/overdue audits and
# a 0-d numpy model in k-means — are fixed and pinned here together
# with the session-4 operators).
# ---------------------------------------------------------------------------

_EMPTY_GATE_QUERIES = [
    "q_dq_referential",
    "q_overdue_customers",
    "q_kmeans_embeddings",
    "q_ts_acf",
    "q_ts_drawdown",
    "q_ts_crosscorr",
    "q_multitouch_attribution",
    "q_text_bigram_logprob",
    "q_text_gopher_rules",
    "q_dedup_containment",
    "q_dedup_containment_sketch",
    "q_sample_domain_match",
    "q_agg_anova",
    "q_text_pmi_collocations",
    "q_conversion_paths",
    "q_grouped_regression",
    "q_rate_anomaly",
    "q_dq_volume_anomaly",
    "q_graph_kcore",
    "q_sql_udf",
    # round-4 additions (audited empty+one-row clean on 2026-08-14)
    "q_ann_recall",
    "q_similarity_pq",
    "q_multimodal_decode_ppm",
    "q_agg_approx_distinct_calibration",
    "q_join_inner_multikey_decimal18",
    "q_sample_weighted_noreplace",
    "q_agg_count_min",
    "q_dedup_prefix_filter",
    "q_text_bpe_apply",
    "q_join_bloom_prefilter",
    "q_join_partition_pruned",
    "q_bootstrap_ci",
    "q_map_in_arrow",
    "q_diff_in_diff",
    "q_embedding_pca",
    "q_markov_attribution",
    # round-5 additions (audited empty+one-row at registration)
    "q_multimodal_decode_png",
    "q_dedup_lsh_verified",
    "q_dedup_lsh_verified_stages",
    "q_text_bpe_train_distributed",
    "q_join_skew_aqe",
    "q_text_bm25",
    "q_search_rrf_fusion",
    "q_text_cdc_chunks",
    "q_agg_kmv_overlap",
    # also covers the r7 _jw_candidates rework's lens==[] early return
    "q_join_jaro_winkler",
    "q_sample_dsir",
    "q_scan_xml",
    "q_dedup_incremental",
    "q_multimodal_decode_jpeg",
    "q_session_window_batch",
    "q_sql_pipe",
    "q_collation_groupby",
    "q_hard_negatives",
    "q_text_readability",
    "q_text_novelty",
    "q_corpus_budget_alloc",
    "q_graph_link_prediction",
    "q_ml_inference_sql",
    "q_gdpr_erasure",
    "q_dp_noisy_counts",
    # round-6 additions (audited empty+one-row at registration)
    "q_text_substring_dedup",
    "q_sample_group_split",
    "q_text_substring_scrub",
    "q_dedup_semantic",
    # round-7 additions / contract-oracle conversions (vacuous-truth
    # flag guards audited at registration)
    "q_join_linkage_stages",
    "q_join_fuzzy_levenshtein",
    "q_geo_nearest",
    "q_dedup_lsh_cap_profile",
    "q_agg_robust_stats_approx",
    "q_agg_approx_distinct",
    "q_agg_hll_sketch",
    "q_dedup_minhash_calibration",
    "q_multimodal_decode_jpeg_progressive",
    # round-8 contract-oracle conversions
    "q_dedup_fuzzy_minhash",
    "q_dedup_simhash",
    "q_multimodal_decode_webp",
    "q_multimodal_decode_webp_lossy",
    "q_multimodal_decode_webp_alpha",
    "q_multimodal_decode_webp_anim",
    "q_dedup_image_phash",
    "q_multimodal_decode_jpeg_arith",
    "q_multimodal_decode_jpeg_prog_arith",
    # round-9 rows-only -> contract-oracle conversions
    "q_surrogate_key",
    "q_scan_binaryfile",
    "q_file_census",
    "q_multimodal_decode_wav",
    "q_multimodal_decode_gif_frames",
    # round-8 late conversions (fake-media plumbing, now oracled)
    "q_multimodal_features",
    "q_multimodal_resize",
    "q_multimodal_frames",
    "q_multimodal_audio",
    # round-11 additions
    "q_text_kneser_ney",
    "q_multimodal_decode_qoi",
    "q_tokenizer_unigram_lm",
    "q_stream_heavy_hitters",
    "q_l_diversity",
    "q_multimodal_decode_tiff",
    "q_scan_avro",
    "q_multimodal_decode_flac",
    "q_t_closeness",
    "q_text_mattr",
    # round-12 additions
    "q_scan_avro_logical",
    "q_scan_arrow_ipc",
    "q_rank_metrics",
    "q_tokenizer_wordpiece",
    "q_snapshot_read_v1",
    "q_snapshot_read_current",
    "q_snapshot_diff",
    "q_snapshot_pruned_read",
    "q_tokenizer_fertility",
    "q_snapshot_changes",
    "q_scan_arrow_stream",
    # round-13 additions
    "q_snapshot_delete_mor",
    "q_snapshot_delete_cow",
    "q_snapshot_schema_evolution",
    "q_snapshot_zorder_read",
    "q_tokenizer_oov",
    "q_snapshot_history",
    "q_snapshot_merge_upsert",
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sf_empty")
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    for t in tables:
        (
            spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
            .limit(0)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(base / f"{t}.parquet"))
        )
    return str(base)


@pytest.mark.parametrize("qid", _EMPTY_GATE_QUERIES)
def test_query_survives_empty_inputs(spark, empty_sf_dir, qid):
    from sparkifydb_datawarehouse_spark import registry

    registry.load_all_modules()
    # must build and execute without raising; row count is free to be 0
    registry.QUERIES[qid](spark, empty_sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()


# ---------------------------------------------------------------------------
# Null-slice gate: a second registry-wide audit ran every query
# against a fixture with ~15% NULLs injected into non-key columns
# (288/292 passed; the four crashes — bytes(None) in the three
# multimodal kernels and element_at(vals, 0) on an all-NULL moving-
# median frame — are fixed and pinned here).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def null_sf_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sf_nulls")
    nullable = {
        "events": ["value", "props", "event_type"],
        "documents": ["text", "lang", "source"],
        "orders": ["o_totalprice", "o_orderpriority", "o_orderdate"],
        "lineitem": ["l_discount", "l_tax", "l_quantity"],
        "customer": [], "supplier": [], "part": [], "nation": [],
        "region": [], "embeddings": ["label"],
    }
    for t, cols in nullable.items():
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        for c in cols:
            if c in df.columns:
                df = df.withColumn(
                    c,
                    F.when(
                        F.abs(F.hash(F.lit(c), df[df.columns[0]])) % 100 < 15,
                        None,
                    ).otherwise(df[c]),
                )
        df.coalesce(1).write.mode("overwrite").parquet(str(base / f"{t}.parquet"))
    return str(base)


@pytest.mark.parametrize(
    "qid",
    [
        "q_multimodal_features",
        "q_multimodal_frames",
        "q_multimodal_resize",
        "q_multimodal_audio",
        "q_window_moving_median",
        "q_dq_rapid_repeat",
        "q_multitouch_attribution",
        "q_text_gopher_rules",
        "q_dedup_containment",
        # round-5 registry-wide null audit finds (2026-08-15)
        "q_hard_negatives",
        "q_markov_attribution",
        # round-6 additions
        "q_text_substring_dedup",
        "q_text_substring_scrub",
        "q_sample_group_split",
        # round-7 additions / conversions
        "q_join_linkage_stages",
        "q_join_fuzzy_levenshtein",
        "q_join_jaro_winkler",
        "q_geo_nearest",
        "q_dedup_lsh_cap_profile",
        "q_agg_robust_stats_approx",
        "q_agg_approx_distinct",
        "q_agg_hll_sketch",
        "q_dedup_minhash_calibration",
        "q_multimodal_decode_jpeg_progressive",
        # round-8 contract-oracle conversions
        "q_dedup_fuzzy_minhash",
        "q_dedup_simhash",
        "q_text_bpe_train_distributed",
        "q_text_bpe_apply",
        "q_dedup_containment_sketch",
        "q_dedup_lsh_verified_stages",
        "q_multimodal_decode_webp",
        "q_multimodal_decode_webp_lossy",
        "q_multimodal_decode_webp_alpha",
        "q_multimodal_decode_webp_anim",
        "q_dedup_image_phash",
        "q_multimodal_decode_jpeg_arith",
        "q_multimodal_decode_jpeg_prog_arith",
        # round-9 rows-only -> contract-oracle conversions
        "q_surrogate_key",
        "q_scan_binaryfile",
        "q_file_census",
        "q_multimodal_decode_wav",
        "q_multimodal_decode_gif_frames",
        # round-11 additions
        "q_text_kneser_ney",
        "q_multimodal_decode_qoi",
        "q_tokenizer_unigram_lm",
        "q_stream_heavy_hitters",
        "q_l_diversity",
        "q_multimodal_decode_tiff",
        "q_scan_avro",
        "q_multimodal_decode_flac",
        "q_t_closeness",
        "q_text_mattr",
        # round-12 additions
        "q_scan_avro_logical",
        "q_scan_arrow_ipc",
        "q_rank_metrics",
        "q_tokenizer_wordpiece",
        "q_snapshot_read_v1",
        "q_snapshot_read_current",
        "q_snapshot_diff",
        "q_snapshot_pruned_read",
        "q_tokenizer_fertility",
        "q_snapshot_changes",
        "q_scan_arrow_stream",
        # round-13 additions
        "q_snapshot_delete_mor",
        "q_snapshot_delete_cow",
        "q_snapshot_schema_evolution",
        "q_snapshot_zorder_read",
        "q_tokenizer_oov",
        "q_snapshot_history",
        "q_snapshot_merge_upsert",
    "q_snapshot_merge_upsert",
    "q_snapshot_history",
    "q_snapshot_merge_upsert",
    ],
)
def test_query_survives_null_slices(spark, null_sf_dir, qid):
    from sparkifydb_datawarehouse_spark import registry

    registry.load_all_modules()
    registry.QUERIES[qid](spark, null_sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()


# ---------------------------------------------------------------------------
# Single-row gate: the third registry-wide audit (one row per table —
# a brand-new tenant). 283/292 passed; the nine crashes were all
# degenerate-denominator statistics (zero variance/range/dof) plus a
# k-means seed shortfall, fixed with try_divide NULL semantics (the
# guards are inert at oracle scale, so value-parity is unchanged) and
# a k = min(k, n) clamp.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def one_row_sf_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sf_one")
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        (
            spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
            .limit(1)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(base / f"{t}.parquet"))
        )
    return str(base)


@pytest.mark.parametrize(
    "qid",
    [
        "q_ab_cuped",
        "q_agg_anova",
        "q_agg_chisquare",
        "q_agg_skew_kurt",
        "q_drift_psi",
        "q_embedding_quantize",
        "q_feature_scaling",
        "q_kfold_metrics",
        "q_kmeans_embeddings",
        # round-4 additions
        "q_ann_recall",
        "q_similarity_pq",
        "q_multimodal_decode_ppm",
        "q_agg_approx_distinct_calibration",
        "q_sample_weighted_noreplace",
        "q_agg_count_min",
        "q_dedup_prefix_filter",
        "q_text_bpe_apply",
        "q_join_bloom_prefilter",
        "q_join_partition_pruned",
        "q_bootstrap_ci",
        "q_map_in_arrow",
        "q_diff_in_diff",
        "q_embedding_pca",
        "q_markov_attribution",
        # round-5 additions
        "q_multimodal_decode_png",
        "q_dedup_lsh_verified",
        "q_dedup_lsh_verified_stages",
        "q_text_bpe_train_distributed",
        "q_join_skew_aqe",
        # round-6 additions
        "q_text_substring_dedup",
        "q_sample_group_split",
        "q_text_substring_scrub",
        "q_dedup_semantic",
        # round-7 additions / conversions
        "q_join_linkage_stages",
        "q_join_fuzzy_levenshtein",
        "q_join_jaro_winkler",
        "q_geo_nearest",
        "q_dedup_lsh_cap_profile",
        "q_agg_robust_stats_approx",
        "q_agg_approx_distinct",
        "q_agg_hll_sketch",
        "q_dedup_minhash_calibration",
        "q_multimodal_decode_jpeg_progressive",
        # round-8 contract-oracle conversions
        "q_dedup_fuzzy_minhash",
        "q_dedup_simhash",
        "q_dedup_containment_sketch",
        "q_multimodal_decode_webp",
        "q_multimodal_decode_webp_lossy",
        "q_multimodal_decode_webp_alpha",
        "q_multimodal_decode_webp_anim",
        "q_dedup_image_phash",
        "q_multimodal_decode_jpeg_arith",
        "q_multimodal_decode_jpeg_prog_arith",
        # round-9 rows-only -> contract-oracle conversions
        "q_surrogate_key",
        "q_scan_binaryfile",
        "q_file_census",
        "q_multimodal_decode_wav",
        "q_multimodal_decode_gif_frames",
        "q_multimodal_features",
        "q_multimodal_resize",
        "q_multimodal_frames",
        "q_multimodal_audio",
        # round-11 additions
        "q_text_kneser_ney",
        "q_multimodal_decode_qoi",
        "q_tokenizer_unigram_lm",
        "q_stream_heavy_hitters",
        "q_l_diversity",
        "q_multimodal_decode_tiff",
        "q_scan_avro",
        "q_multimodal_decode_flac",
        "q_t_closeness",
        "q_text_mattr",
        # round-12 additions
        "q_scan_avro_logical",
        "q_scan_arrow_ipc",
        "q_rank_metrics",
        "q_tokenizer_wordpiece",
        "q_snapshot_read_v1",
        "q_snapshot_read_current",
        "q_snapshot_diff",
        "q_snapshot_pruned_read",
        "q_tokenizer_fertility",
        "q_snapshot_changes",
        "q_scan_arrow_stream",
        # round-13 additions
        "q_snapshot_delete_mor",
        "q_snapshot_delete_cow",
        "q_snapshot_schema_evolution",
        "q_snapshot_zorder_read",
        "q_tokenizer_oov",
        "q_snapshot_history",
        "q_snapshot_merge_upsert",
    "q_snapshot_merge_upsert",
    "q_snapshot_history",
    "q_snapshot_merge_upsert",
    ],
)
def test_query_survives_single_row(spark, one_row_sf_dir, qid):
    from sparkifydb_datawarehouse_spark import registry

    registry.load_all_modules()
    registry.QUERIES[qid](spark, one_row_sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
