"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``transit_data_pipeline_spark.operators`` —
this module only adapts the registry to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from transit_data_pipeline_spark.operators.registry import all_specs  # noqa: E402
from transit_data_pipeline_spark.session import configure  # noqa: E402

#: Every query with a driver CORRECTNESS row in rounds 1-7. Used to
#: sort the post-front remainder: never-checked queries first (they
#: claim leftover window slots), re-confirmations after, rows-only
#: (no-oracle) queries last.
_EVER_CHECKED = frozenset(
    {
        # rounds 1-5
        "analysis_daily_trend_ma7",
        "analysis_delay_cascade",
        "analysis_dow_pattern",
        "analysis_monthly_quartiles",
        "analysis_recent_vs_historical",
        "analysis_route_stop_hotspots",
        "analysis_stop_hotspots",
        "analysis_weather_impact",
        "anti_join_orphans",
        "append_sink_roundtrip",
        "asof_join_prior_purchase",
        "bloom_join_prefilter",
        "bucketed_colocated_join",
        "case_coalesce_bounding",
        "column_profile",
        "column_profile_approx",
        "conditional_aggregates",
        "corpus_curation_funnel",
        "corpus_data_card",
        "cross_join_grid",
        "csv_roundtrip",
        "cube_priority_status",
        "cumulative_share",
        "data_mix_rebalance",
        "date_parts_smart_keys",
        "day_name_trim",
        "dedup_components",
        "dedup_embedding_cosine",
        "dedup_exact",
        "dedup_first_wins",
        "dedup_incremental_snapshot",
        "dedup_levenshtein",
        "dedup_lsh_verified",
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "dedup_simhash",
        "deterministic_sample",
        "dim_date_series",
        "distinct_projection",
        "doc_chunking",
        "dpp_partitioned_fact_join",
        "dynamic_day_column",
        "embedding_norm_stats",
        "embedding_quantize_int8",
        "exact_percentiles",
        "feature_join_update",
        "filter_project_cast",
        "global_stats",
        "gtfs_time_parse",
        "hash_split_3way",
        "hourly_bucket_lookup",
        "hourly_event_rollup",
        "json_props_extract",
        "jsonl_roundtrip",
        "kmeans_semantic_clusters",
        "lag_cascade",
        "limit_without_order",
        "ml_gbt_cv_metrics",
        "monthly_trend_ma3",
        "moving_avg_7day",
        "multikey_validation_join",
        "multimodal_binary_meta",
        "multimodal_decode_probe",
        "multimodal_frame_sample",
        "multimodal_phash_near_dup",
        "multimodal_resize_features",
        "mv_incremental_refresh",
        "mv_refresh",
        "one_row_frame_lag",
        "pack_sequences",
        "per_source_cap",
        "perf_ranking_trends",
        "pivot_status_matrix",
        "range_join_price_bands",
        "rank_suite",
        "retention_filter",
        "risk_binning",
        "rolling_distinct_users",
        "rollup_multi_granularity",
        "salted_skew_agg",
        "scd2_user_type_history",
        "schema_bootstrap",
        "semi_join_per_nation",
        "sessionization_gap30m",
        "set_ops_suite",
        "similarity_bruteforce_topk",
        "similarity_ivf_ann",
        "similarity_ivf_recall",
        "similarity_lsh_ann",
        "sketch_countmin_freq",
        "sketch_histogram_quantiles",
        "sketch_hll_distinct",
        "sketch_kmv_distinct",
        "sql_over_views",
        "star_join_region_rollup",
        "stddev_by_group",
        "stratified_sample",
        "streaming_dedup",
        "streaming_feature_append",
        "streaming_hourly_rollup",
        "streaming_late_data_drop",
        "streaming_sliding_rate",
        "streaming_stateful_sessions",
        "synthetic_weather_model",
        "text_benchmark_contamination",
        "text_bpe_pair_counts",
        "text_bpe_token_count",
        "text_fingerprint",
        "text_gopher_rules",
        "text_langid",
        "text_pii_scrub",
        "text_quality_score",
        "text_repetition_filter",
        "text_token_stats",
        "topk_orders",
        "train_test_split",
        "two_level_agg_having",
        "union_all_counts",
        "vocab_heavy_hitters",
        "window_value_suite",
        "winsorize_clip",
        "zscore_normalize",
        # round 6 (48 green + the 2 harness-compat reds re-fronted in
        # _R8_FRONT below)
        "abc_customer_classification",
        "analysis_stop_hotspots",
        "collation_aware_grouping",
        "cumulative_share",
        "curriculum_phases",
        "dedup_sorted_neighborhood",
        "higher_order_lambda_suite",
        "isotonic_calibration_pav",
        "ks_two_sample",
        "lateral_topk_per_group",
        "parameterized_sql_query",
        "pareto_frontier",
        "quality_decile_calibration",
        "quantile_normalize_scores",
        "recursive_cte_hierarchy",
        "rfm_segments",
        "rouge_overlap_pairs",
        "spearman_rank_corr",
        "sql_pipe_syntax_query",
        "sql_scripting_batch",
        "sql_session_variables",
        "sql_udf_delay_category",
        "tpch_q10_returned_items",
        "tpch_q11_important_stock",
        "tpch_q12_shipping_priority_class",
        "tpch_q13_customer_distribution",
        "tpch_q14_promo_revenue",
        "tpch_q15_top_supplier",
        "tpch_q16_supplier_part_counts",
        "tpch_q17_small_quantity_revenue",
        "tpch_q18_large_volume_customer",
        "tpch_q19_discounted_revenue",
        "tpch_q1_pricing_summary",
        "tpch_q20_potential_promotion",
        "tpch_q21_suppliers_kept_waiting",
        "tpch_q22_global_sales_opportunity",
        "tpch_q2_min_cost_supplier",
        "tpch_q3_shipping_priority",
        "tpch_q4_order_priority",
        "tpch_q5_local_supplier_volume",
        "tpch_q6_revenue_change",
        "tpch_q7_volume_shipping",
        "tpch_q8_market_share",
        "tpch_q9_product_profit",
        "try_functions_suite",
        "variant_props_extract",
        "vocab_coverage_curve",
        "vocab_zipf_fit",
        "xml_ingest_roundtrip",
        "zone_map_skipping_eval",
        # round 7 (50/50 green — stats/timeseries/events wave)
        "ab_cuped_adjustment",
        "ab_srm_check",
        "ab_test_zscore",
        "acf_daily_orders",
        "auc_mann_whitney",
        "benford_audit",
        "bh_fdr_control",
        "bootstrap_poisson_ci",
        "cross_corr_lagged",
        "cusum_changepoint",
        "did_estimator",
        "downsample_lttb",
        "event_attribution_last_touch",
        "event_funnel_steps",
        "event_markov_transitions",
        "event_mix_entropy_daily",
        "event_path_analysis",
        "event_session_pmi",
        "events_anomaly_mad",
        "events_rate_anomaly",
        "events_rolling_hour_range",
        "ewma_smoothing",
        "forecast_backtest_suite",
        "funnel_time_to_convert",
        "gains_lift_table",
        "gap_fill_linear_interp",
        "gap_fill_locf",
        "gini_token_concentration",
        "holm_stepdown_ab_tests",
        "interarrival_dispersion",
        "interval_coverage",
        "mann_kendall_trend",
        "model_calibration_bins",
        "next_event_features",
        "ohlc_bars",
        "permutation_test_means",
        "propensity_strata_att",
        "retention_cohorts",
        "rolling_regression_slope",
        "seasonal_decompose_dow",
        "skewness_exact_moments",
        "streaks_active_days",
        "survival_km_retention",
        "theilsen_trend",
        "time_range_window",
        "time_weighted_avg",
        "welch_ttest",
        "wilson_ci_conversion",
    }
)


#: Round-8 front of the driver's ~50-query check window. 145 of 363
#: registered queries have never had a driver CORRECTNESS row (the
#: window is ~50/round). Per VERDICT r7 item 1: land this round's 50
#: on the streaming / sketch / embedding / retrieval / dedup / dp
#: families, plus the new D7 oracle-split query first so all 86 §2
#: ops gain a hash-green row. The remainder of the never-checked
#: backlog follows automatically via _ordered_specs.
_R8_FRONT = (
    # D7 oracle split (VERDICT r7 item 2) — hash-checkable metric
    # arithmetic over frozen predictions
    "ml_frozen_prediction_metrics",
    # streaming wave (7)
    "streaming_stream_stream_join",
    "streaming_session_window",
    "streaming_topk_trending",
    "streaming_cdc_upsert",
    "streaming_backfill_bridge",
    "streaming_psi_drift",
    "streaming_checkpoint_resume",
    # sketch wave (9)
    "sketch_bloom_membership",
    "sketch_join_cardinality",
    "sketch_kmv_union",
    "sketch_kmv_intersection",
    "sketch_kmv_rolling_distinct",
    "sketch_ddsketch_quantiles",
    "sketch_native_hll_datasketches",
    "moments_partial_merge",
    "topk_two_level_merge",
    # embedding / similarity / retrieval wave (9)
    "embedding_centroid_drift",
    "embedding_knn_outliers",
    "embedding_pca_power",
    "embedding_matryoshka_recall",
    "embedding_binary_quantization",
    "jl_random_projection",
    "retrieval_maxsim_late_interaction",
    "retrieval_ndcg_eval",
    "retrieval_rrf_fusion",
    # dedup wave (12)
    "dedup_substring_spans",
    "minhash_source_overlap",
    "dedup_graph_triangles",
    "dedup_minhash_incremental",
    "dedup_containment",
    "lsh_threshold_sweep",
    "dedup_semdedup",
    "contrastive_pair_mining",
    "simhash_eval_pr",
    "doc_ngram_novelty",
    "dedup_cluster_stats",
    "fellegi_sunter_linkage",
    # curation / dp wave (11)
    "dedup_keep_best",
    "k_anonymity_audit",
    "l_diversity_audit",
    "t_closeness_audit",
    "dp_noisy_counts",
    "dp_quantile_exponential",
    "quality_weighted_sampling",
    "erasure_cascade_audit",
    "js_divergence_sources",
    "token_budget_mix_solver",
    "survivorship_merge",
    # buffer in case the window runs long: multimodal + graph tails
    "multimodal_shard_packing",
    "multimodal_audio_energy",
    "multimodal_scene_segments",
    "multimodal_modality_mix",
    "bfs_shortest_hops",
    "kcore_trade_graph",
    "adamic_adar_link_prediction",
    "corpus_merkle_manifest",
)


def _ordered_specs():
    specs = all_specs()
    front = [n for n in _R8_FRONT if n in specs]
    rest = [n for n in specs if n not in set(front)]
    # Never-driver-checked queries before re-confirmations;
    # oracle-backed (strong hash-checked rows) before rows-only
    # (e.g. the GBT cross-validation run, which is also the slowest
    # query in the registry).
    rest.sort(key=lambda n: (n in _EVER_CHECKED, specs[n].oracle is None))
    return {n: specs[n] for n in (*front, *rest)}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    configure(spark)
    specs = all_specs()
    return specs["perf_ranking_trends"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(spec.fn) for name, spec in _ordered_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin SQL for each query (omitted → rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in _ordered_specs().items()
        if spec.oracle is not None
    }
