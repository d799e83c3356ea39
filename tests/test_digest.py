"""The scale_verify in-engine digest must agree with the strict
compare's verdict: green on a true match, red on value / row-count
drift — otherwise the ×64 campaign's digest-mode rows prove nothing.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

from scale_verify import digest_compare  # noqa: E402

from transit_data_pipeline_spark.operators.registry import all_specs  # noqa: E402

#: Queries spanning every output type family the renderer handles:
#: float ratios, decimal-exact sums, timestamps, bools, strings, ints.
_SAMPLE = [
    "ml_frozen_prediction_metrics",  # bool + double + string
    "retention_cohorts",  # timestamp + long + double
    "tpch_q1_pricing_summary",  # decimal-exact aggregate block
    "dedup_simhash",  # the digest mode's production user
]


@pytest.mark.parametrize("name", _SAMPLE)
def test_digest_matches_on_true_match(name, spark, sf_dir, duck):
    spec = all_specs()[name]
    assert digest_compare(spec.fn(spark, sf_dir), spec.oracle, duck) == []


def test_digest_catches_value_drift(spark, sf_dir, duck):
    """Perturb one cell's value by one rounding unit → digest red."""
    spec = all_specs()["tpch_q1_pricing_summary"]
    df = spec.fn(spark, sf_dir)
    from pyspark.sql import functions as F

    col = "sum_qty"
    assert col in df.columns
    drifted = df.withColumn(col, F.col(col) + 0.000001)
    problems = digest_compare(drifted, spec.oracle, duck)
    assert problems and "digest mismatch" in problems[0]


def test_digest_catches_decimal_drift_past_6dp(spark, duck):
    """DECIMALs are exact — a drift at the 9th decimal place must go
    red (ADVICE r8: the old ROUND(col, 6) rendering made any drift
    past the 6th place invisible in digest mode)."""
    drifted = spark.sql(
        "SELECT CAST(1.123456790 AS DECIMAL(20,9)) AS v, 'a' AS k"
    )
    oracle = "SELECT CAST(1.123456789 AS DECIMAL(20,9)) AS v, 'a' AS k"
    problems = digest_compare(drifted, oracle, duck)
    assert problems and "digest mismatch" in problems[0]


def test_digest_decimal_scale_widening_is_not_drift(spark, duck):
    """Same values at different declared scales must stay green: the
    renderer normalizes scale (Spark/DuckDB widen SUM/AVG decimals
    differently), so scale drift alone is not value drift."""
    df = spark.sql("SELECT CAST(1.123456789 AS DECIMAL(20,9)) AS v, 'a' AS k")
    oracle = "SELECT CAST(1.123456789 AS DECIMAL(30,12)) AS v, 'a' AS k"
    assert digest_compare(df, oracle, duck) == []


def test_digest_mixed_float_decimal_family_is_harmonized(spark, duck):
    """Spark double vs DuckDB DECIMAL of the same value must stay
    green — the engine casts decimal-exact aggregates to double at
    the boundary, so the pair renders via the common 6dp float path."""
    df = spark.sql("SELECT CAST(1.5 AS DOUBLE) AS v, 'a' AS k")
    oracle = "SELECT CAST(1.5 AS DECIMAL(20,9)) AS v, 'a' AS k"
    assert digest_compare(df, oracle, duck) == []


def test_digest_catches_row_count_drift(spark, sf_dir, duck):
    spec = all_specs()["tpch_q1_pricing_summary"]
    df = spec.fn(spark, sf_dir)
    problems = digest_compare(df.limit(1), spec.oracle, duck)
    assert problems and "digest mismatch" in problems[0]


def test_digest_catches_schema_drift(spark, sf_dir, duck):
    spec = all_specs()["tpch_q1_pricing_summary"]
    df = spec.fn(spark, sf_dir)
    renamed = df.withColumnRenamed("sum_qty", "sum_quantity")
    problems = digest_compare(renamed, spec.oracle, duck)
    assert problems and "schema" in problems[0]


def test_designed_refusal_requires_the_guards_own_error():
    """Only the blast-radius guard's ValueError counts as OK-REFUSED;
    any other exception at the refusal factor is a regression
    (ADVICE r8: scale_verify must not mask engine breakage)."""
    from scale_verify import BOUNDS, is_designed_refusal

    bound = BOUNDS["simhash_eval_pr"]
    guard = ValueError(
        "simhash_eval_pr: estimated truth-join blow-up Σdf²=179,000,000 "
        "exceeds max_join_rows=100,000,000"
    )
    assert is_designed_refusal(guard, bound)
    assert not is_designed_refusal(RuntimeError(str(guard)), bound)
    assert not is_designed_refusal(ValueError("AnalysisException-ish"), bound)
    assert not is_designed_refusal(MemoryError(), bound)
    # Default marker (no refusal_marker in the bound) still requires
    # the guard family's 'exceeds max_' text on a ValueError.
    assert is_designed_refusal(
        ValueError("x: 300,000 vectors exceeds max_vectors=200,000"), {}
    )
    assert not is_designed_refusal(ValueError("boom"), {})
