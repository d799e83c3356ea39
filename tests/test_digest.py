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
