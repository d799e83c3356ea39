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

#: Every query with a driver CORRECTNESS row in rounds 1-6. Used to
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
        # _R7_FRONT below)
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
    }
)


#: Round-7 front of the driver's ~50-query check window. 193 of 363
#: registered queries have never had a driver CORRECTNESS row (the
#: window is ~50/round). Per VERDICT r6: the two r06 harness-compat
#: reds first (q12 oracle BIGINT cast + lambda-suite array
#: serialization landed this round — the green rows must post-date the
#: fixes), then the never-checked stats/timeseries/events waves in
#: queue order. The remainder of the never-checked backlog follows
#: automatically via _ordered_specs.
_R7_FRONT = (
    # r06 reds, re-checked after this round's fixes
    "tpch_q12_shipping_priority_class",
    "higher_order_lambda_suite",
    # r6-front tail that missed the 50-row window
    "skewness_exact_moments",
    "interarrival_dispersion",
    "wilson_ci_conversion",
    "bh_fdr_control",
    "permutation_test_means",
    "holm_stepdown_ab_tests",
    "did_estimator",
    "welch_ttest",
    "gains_lift_table",
    "mann_kendall_trend",
    "downsample_lttb",
    "events_rolling_hour_range",
    "time_range_window",
    "gap_fill_locf",
    "streaks_active_days",
    # stats / timeseries wave
    "ab_test_zscore",
    "ab_srm_check",
    "ab_cuped_adjustment",
    "acf_daily_orders",
    "benford_audit",
    "cusum_changepoint",
    "ewma_smoothing",
    "ohlc_bars",
    "gap_fill_linear_interp",
    "seasonal_decompose_dow",
    "interval_coverage",
    "time_weighted_avg",
    "rolling_regression_slope",
    "cross_corr_lagged",
    "theilsen_trend",
    "survival_km_retention",
    "gini_token_concentration",
    "forecast_backtest_suite",
    "propensity_strata_att",
    "bootstrap_poisson_ci",
    "model_calibration_bins",
    "auc_mann_whitney",
    # events wave
    "retention_cohorts",
    "event_funnel_steps",
    "events_rate_anomaly",
    "funnel_time_to_convert",
    "event_markov_transitions",
    "event_attribution_last_touch",
    "event_session_pmi",
    "events_anomaly_mad",
    "next_event_features",
    "event_path_analysis",
    "event_mix_entropy_daily",
    "point_in_time_features",
    "nearest_event_join",
    "source_freshness_monitor",
    "event_pattern_automaton",
    "time_decay_attribution",
    "shapley_channel_attribution",
    "dau_wau_stickiness",
    "session_window_dynamic_gap",
    # buffer (graph wave head) in case the window runs long
    "bfs_shortest_hops",
    "kcore_trade_graph",
    "adamic_adar_link_prediction",
    "corpus_merkle_manifest",
)


def _ordered_specs():
    specs = all_specs()
    front = [n for n in _R7_FRONT if n in specs]
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
