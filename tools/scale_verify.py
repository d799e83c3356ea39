"""×N strict oracle-parity sweep: the CORRECTNESS half of the scale
probes (SCALING.md r7: "green at sf0.1 does not certify
branch-consistency properties that depend on sampling — scale probes
must include a correctness pass, not just timings").

Builds (or reuses) the ×N corpus from tools/scale_probe.build_xn,
registers DuckDB views over the same parquet, and runs each query
through tests/compare.compare — the driver-strict gate (exact values,
bitwise floats, dtype families, no non-scalar cells). This is the
machinery that would have caught the r7 two_phase_rank boundary-
divergence bug from a harness instead of an eyeball: at ×64 the range
sampler's per-branch boundary draws diverge and global ranks stop
being a permutation, while every sf ≤ 0.1 check stays green.

Usage:  python tools/scale_verify.py [--factor N] [query ...]
        (default ×64 over the curated at-risk list below)

The default list targets the operator families whose physical plans
change shape with data volume: every two-phase-rank consumer, the
sorted-neighborhood scans, the dedup/similarity candidate-generation
paths, the events/time-series family (the probe corpus builds events
in DuckDB at µs timestamp precision — one of the two encodings
`catalog.normalize_events` accepts — so both engines read identical
values), and the heaviest TPC-H joins. Excluded by design:
`dedup_ngram_jaccard` (its Σdf² guard refuses the ×64 clique corpus —
that refusal is itself probed in SCALING.md).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

#: Operator families whose plans change shape with volume — the
#: curated default sweep (every name oracle-backed).
AT_RISK = [
    # two-phase rank / NTILE consumers (functions/ranking.py)
    "train_test_split",
    "cumulative_share",
    "rank_suite",
    "quality_decile_calibration",
    "curriculum_phases",
    "dedup_keep_best",
    "quantile_normalize_scores",
    "gains_lift_table",
    "zone_map_skipping_eval",
    "abc_customer_classification",
    "rfm_segments",
    "spearman_rank_corr",
    "ks_two_sample",
    "isotonic_calibration_pav",
    "gini_token_concentration",
    "vocab_zipf_fit",
    "vocab_coverage_curve",
    "auc_mann_whitney",
    # sorted-neighborhood ghost-row scans
    "dedup_sorted_neighborhood",
    "rouge_overlap_pairs",
    # dedup candidate generation / clustering
    "dedup_exact",
    "dedup_first_wins",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_semdedup",
    "dedup_cluster_stats",
    "dedup_components",
    "simhash_eval_pr",
    "lsh_threshold_sweep",
    "minhash_source_overlap",
    "dedup_containment",
    # ANN / embedding paths
    "similarity_lsh_ann",
    "similarity_ivf_ann",
    "similarity_ivf_recall",
    "similarity_bruteforce_topk",
    "embedding_binary_quantization",
    "jl_random_projection",
    "embedding_pca_power",
    # text pipelines over the duplicated corpus
    "text_token_stats",
    "text_quality_score",
    "text_tfidf_keywords",
    "text_bm25_topk",
    "text_winnowing_fingerprints",
    "text_fingerprint",
    # events / time-series (dense-traffic adversarial: every event
    # duplicated ×N at the same timestamp)
    "hourly_event_rollup",
    "events_rolling_hour_range",
    "time_range_window",
    "gap_fill_locf",
    "streaks_active_days",
    "ohlc_bars",
    "time_weighted_avg",
    "retention_cohorts",
    "event_funnel_steps",
    "funnel_time_to_convert",
    "next_event_features",
    "point_in_time_features",
    "nearest_event_join",
    "session_window_dynamic_gap",
    "dau_wau_stickiness",
    "asof_join_prior_purchase",
    # multimodal binary columns (metadata, frame sampling, pHash bands)
    "multimodal_audio_energy",
    "multimodal_binary_meta",
    "multimodal_decode_probe",
    "multimodal_frame_sample",
    "multimodal_modality_mix",
    "multimodal_phash_near_dup",
    "multimodal_resize_features",
    "multimodal_scene_segments",
    "multimodal_shard_packing",
    # statistics / experiment-analysis wave
    "permutation_test_means",
    "bh_fdr_control",
    "holm_stepdown_ab_tests",
    "did_estimator",
    "wilson_ci_conversion",
    "skewness_exact_moments",
    "forecast_backtest_suite",
    "propensity_strata_att",
    # unpartitioned-window whitelist members (calendar-bounded claims)
    "moving_avg_7day",
    "monthly_trend_ma3",
    # heaviest TPC-H joins
    "tpch_q1_pricing_summary",
    "tpch_q9_product_profit",
    "tpch_q18_large_volume_customer",
    "tpch_q21_suppliers_kept_waiting",
]


def main() -> int:
    args = sys.argv[1:]
    factor = 64
    if args and args[0] == "--factor":
        factor = int(args[1])
        args = args[2:]
    names = args or AT_RISK

    import duckdb
    from pyspark.sql import SparkSession

    from scale_probe import build_xn
    from compare import compare
    from transit_data_pipeline_spark.catalog import TABLES
    from transit_data_pipeline_spark.operators.registry import all_specs
    from transit_data_pipeline_spark.session import get_spark

    # The comparison collects FULL result sets via toPandas — at ×64
    # some verify outputs (e.g. dedup_simhash's block-local Hamming
    # pairs on the 64-clique corpus) exceed the 1 GiB default
    # spark.driver.maxResultSize. That's a harness collect, not an
    # engine one (source code never collects data frames), so the cap
    # is raised HERE, in the tool's own session, not in the factory.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    (
        SparkSession.builder.appName("tdps-scale-verify")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.driver.maxResultSize", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark = get_spark("tdps-scale-verify")
    xdir = build_xn(spark, factor)

    # Cap DuckDB's native memory and give it a spill directory: the
    # ×64 oracle sides (serial windows over 3.2M-doc shingle
    # explosions) otherwise balloon past the box's RAM and draw the
    # kernel OOM killer — observed killing the whole sweep at
    # anon-rss ≈ 120 GB. With a cap DuckDB spills instead.
    con = duckdb.connect(config={"memory_limit": "48GB"})
    con.execute(f"SET temp_directory='{xdir}/duckdb_spill'")
    for t in TABLES:
        # Spark writes each ×N table as a directory of part files;
        # events is a single DuckDB-written file (see build_xn).
        path = f"{xdir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    specs = all_specs()
    fails: list[tuple[str, str]] = []
    for name in names:
        spec = specs.get(name)
        if spec is None:
            fails.append((name, "UNKNOWN query name"))
            continue
        if spec.oracle is None:
            print(f"{name}: SKIP (rows-only, no oracle)", flush=True)
            continue
        t0 = time.monotonic()
        try:
            problems = compare(spec.fn(spark, xdir), spec.oracle, con)
        except Exception as e:  # noqa: BLE001 — report and continue
            fails.append((name, f"EXC {type(e).__name__}: {e}"))
            print(f"{name}: EXC {type(e).__name__} "
                  f"({time.monotonic() - t0:.1f}s)", flush=True)
            continue
        dt = time.monotonic() - t0
        if problems:
            fails.append((name, "; ".join(problems)[:500]))
            print(f"{name}: FAIL ({dt:.1f}s)", flush=True)
        else:
            print(f"{name}: OK ({dt:.1f}s)", flush=True)

    print(f"\n{'FAILURES:' if fails else 'ALL OK'} "
          f"({len(names) - len(fails)}/{len(names)} green at ×{factor})")
    for n, m in fails:
        print(f"  {n}: {m}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
