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

#: Queries with a fully green row in CORRECTNESS_r01.json. The driver
#: verifies queries in dict order under a bounded budget (r1 stopped at
#: 50 of 77), so queries that still need a green row — the red
#: `conditional_aggregates` row, everything never checked in r1, and
#: anything newly registered — are emitted FIRST; the already-green set
#: follows. This rotation gives every registered query a driver-checked
#: row across rounds.
_R1_GREEN = frozenset(
    {
        "perf_ranking_trends", "filter_project_cast", "case_coalesce_bounding",
        "distinct_projection", "anti_join_orphans", "semi_join_per_nation",
        "star_join_region_rollup", "cross_join_grid", "exact_percentiles",
        "stddev_by_group", "two_level_agg_having", "global_stats",
        "topk_orders", "union_all_counts", "dedup_first_wins",
        "date_parts_smart_keys", "dim_date_series", "risk_binning",
        "retention_filter", "set_ops_suite", "window_value_suite",
        "lag_cascade", "rank_suite", "moving_avg_7day", "monthly_trend_ma3",
        "cumulative_share", "train_test_split", "one_row_frame_lag",
        "hourly_event_rollup", "hourly_bucket_lookup", "json_props_extract",
        "sessionization_gap30m", "asof_join_prior_purchase",
        "feature_join_update", "multikey_validation_join",
        "dynamic_day_column", "deterministic_sample", "salted_skew_agg",
        "range_join_price_bands", "rollup_multi_granularity",
        "cube_priority_status", "pivot_status_matrix", "stratified_sample",
        "csv_roundtrip", "append_sink_roundtrip", "sql_over_views",
        "schema_bootstrap", "mv_refresh", "gtfs_time_parse",
    }
)


#: Round-5 front of the driver's ~50-query check window: the 49 queries
#: whose most recent driver CORRECTNESS row is r01 — adjudicated BEFORE
#: the driver regenerated /root/testdata (events.ts encoding change) —
#: rotated to the front so every registered query's driver row postdates
#: the current fixtures. Events family first (the family that regressed
#: in r3 under the new encoding), then the remaining r01-only set.
#: Queries registered this round (never driver-checked) follow at the
#: tail of the front list so they claim any leftover window slots.
_R5_FRONT = (
    # events family — r01-only AND the family hit by the fixture regen
    "asof_join_prior_purchase",
    "hourly_event_rollup",
    "sessionization_gap30m",
    "json_props_extract",
    "lag_cascade",
    "hourly_bucket_lookup",
    # remaining r01-only queries (latest driver row predates fixtures)
    "anti_join_orphans",
    "append_sink_roundtrip",
    "case_coalesce_bounding",
    "cross_join_grid",
    "csv_roundtrip",
    "cube_priority_status",
    "cumulative_share",
    "date_parts_smart_keys",
    "dedup_first_wins",
    "deterministic_sample",
    "dim_date_series",
    "distinct_projection",
    "dynamic_day_column",
    "exact_percentiles",
    "feature_join_update",
    "filter_project_cast",
    "global_stats",
    "gtfs_time_parse",
    "monthly_trend_ma3",
    "moving_avg_7day",
    "multikey_validation_join",
    "mv_refresh",
    "one_row_frame_lag",
    "perf_ranking_trends",
    "pivot_status_matrix",
    "range_join_price_bands",
    "rank_suite",
    "retention_filter",
    "risk_binning",
    "rollup_multi_granularity",
    "salted_skew_agg",
    "schema_bootstrap",
    "semi_join_per_nation",
    "set_ops_suite",
    "sql_over_views",
    "star_join_region_rollup",
    "stddev_by_group",
    "stratified_sample",
    "topk_orders",
    "train_test_split",
    "two_level_agg_having",
    "union_all_counts",
    "window_value_suite",
    # registered in round 5 (never driver-checked)
    "column_profile_approx",
    "text_bigram_perplexity",
    "text_tfidf_keywords",
    "dedup_substring_spans",
    "dedup_keep_best",
    "event_funnel_steps",
    "retention_cohorts",
    "time_range_window",
    "gap_fill_locf",
    "streaks_active_days",
    "argmax_per_group",
    "array_agg_suite",
    "grouping_sets_report",
    "minhash_source_overlap",
    "orc_roundtrip",
    "text_inverted_index",
    "text_bm25_topk",
    "streaming_stream_stream_join",
    "rfm_segments",
    "schema_evolution_merge",
    "streaming_session_window",
    "shuffle_hash_join_hint",
    "clustered_write_roundtrip",
    "corr_features",
    "unpivot_melt",
    "null_safe_join",
    "feature_drift_psi",
    "zorder_key_layout",
    "dedup_graph_triangles",
    "events_rate_anomaly",
    "similarity_pq_codes",
    "funnel_time_to_convert",
    "bfs_shortest_hops",
    "kcore_trade_graph",
    "sketch_ddsketch_quantiles",
    "permutation_test_means",
    "downsample_lttb",
    "dedup_sorted_neighborhood",
    "span_corruption_plan",
    "bh_fdr_control",
    "mann_kendall_trend",
    "survivorship_merge",
    "text_kneser_ney_bigram",
    "dau_wau_stickiness",
    "variant_props_extract",
    "streaming_checkpoint_resume",
    "sql_udf_delay_category",
    "observe_pipeline_metrics",
    "session_window_dynamic_gap",
    "analyze_table_stats",
    "adamic_adar_link_prediction",
    "sketch_kmv_rolling_distinct",
    "wilson_ci_conversion",
    "rouge_overlap_pairs",
    "federated_format_union",
    "agg_builtins_suite",
    "window_ignore_nulls_suite",
    "regexp_functions_suite",
    "higher_order_lambda_suite",
    "string_functions_suite",
    "sql_pipe_syntax_query",
    "lateral_topk_per_group",
    "sql_session_variables",
    "parameterized_sql_query",
    "recursive_cte_hierarchy",
    "sql_scripting_batch",
    "dataframe_transpose_report",
    "collation_aware_grouping",
    "xml_ingest_roundtrip",
    "date_functions_suite",
    "sketch_native_hll_datasketches",
    "map_functions_suite",
    "string_agg_ordered",
    "try_functions_suite",
    "embedding_binary_quantization",
    "partition_retention_drop",
    "events_rolling_hour_range",
    "skewness_exact_moments",
    "interarrival_dispersion",
    "abc_customer_classification",
)


def _ordered_specs():
    specs = all_specs()
    front = [n for n in _R5_FRONT if n in specs]
    rest = [n for n in specs if n not in set(front)]
    # Among the rest: queries with no green row yet (newly registered)
    # before re-confirmations; oracle-backed (strong hash-checked rows)
    # before rows-only (e.g. the GBT cross-validation run, which is also
    # the slowest query in the registry).
    rest.sort(key=lambda n: (n in _R1_GREEN, specs[n].oracle is None))
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
