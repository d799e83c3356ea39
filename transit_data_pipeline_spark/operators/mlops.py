"""Synthetic-generator and ML-training operators (SURVEY §2 D3-D5, D7).

The reference's weather/delay simulators (`generate_synthetic_data.py:
127-243`) draw from ``random``; a driver-side RNG loop cannot scale and
cannot be oracle-checked. Here every draw is a *keyed* integer-hash
uniform (Knuth multiplicative hashing) computed identically by Spark
and DuckDB — fully distributed, reproducible on any partitioning, and
bitwise-checkable. Trig columns are rounded on both sides so a
last-ulp libm difference between JVM and C++ can't flip the hash.

The model-training operator (D7) is genuinely non-SQL; it registers
with ``oracle=None`` → the driver records a rows-only check.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from .registry import register

#: Knuth multiplicative-hash constants (public domain, TAOCP vol. 3).
_H1 = 2654435761
_H2 = 2246822519
_MOD = 4294967296  # 2^32


def _uniform_sql(key: str, mult: int) -> str:
    return f"CAST(({key} * {mult}) % {_MOD} AS DOUBLE) / {_MOD}"


def _uniform_col(key, mult: int):
    return ((key * F.lit(mult)) % F.lit(_MOD)).cast("double") / F.lit(_MOD)


_GRID_DAYS = 60
_COND_CASE = """CASE
  WHEN u1 < 0.5 THEN 'clear'
  WHEN u1 < 0.7 THEN 'cloudy'
  WHEN u1 < 0.85 THEN 'rain'
  WHEN u1 < 0.95 THEN 'snow'
  ELSE 'storm' END"""
_MULT_CASE = """CASE condition
  WHEN 'clear' THEN 1.0 WHEN 'cloudy' THEN 1.1 WHEN 'rain' THEN 1.5
  WHEN 'snow' THEN 2.0 ELSE 2.5 END"""


@register(
    "synthetic_weather_model",
    ops=("D3", "D4", "D5", "J10", "F7"),
    doc="The weather/delay simulators (`generate_synthetic_data.py:"
    "127-243`) as pure column expressions over a generated date×hour "
    "grid: seasonal+diurnal sinusoid temperature (D3), rush/weather/"
    "holiday delay-probability chain capped at 0.8 (D4), three-bucket "
    "delay magnitude clamped to [1,120] (D5) — keyed-hash uniforms "
    "replace random(), so the whole simulation is distributed and "
    "deterministic.",
    oracle=f"""
WITH grid AS (
  SELECT d.day_index, h.hour,
         d.day_index * 24 + h.hour + 1 AS cell_key
  FROM range(0, {_GRID_DAYS}) d(day_index)
  CROSS JOIN range(0, 24) h(hour)
), drawn AS (
  SELECT day_index, hour,
    CAST(DATE '2024-01-01' + CAST(day_index AS INTEGER) AS TIMESTAMP) AS grid_date,
    ROUND(10.0 + 15.0 * SIN(2 * pi() * ((day_index + 1) - 81) / 365.0)
               + 5.0 * SIN(2 * pi() * (hour - 9) / 24.0), 4) AS temperature_c,
    {_uniform_sql("cell_key", _H1)} AS u1,
    {_uniform_sql("cell_key", _H2)} AS u2,
    CASE WHEN hour IN (7, 8, 9, 17, 18, 19) THEN 1.8 ELSE 1.0 END AS rush_mult,
    CASE WHEN day_index = 0 THEN 0.7 ELSE 1.0 END AS holiday_mult
  FROM grid
), cond AS (
  SELECT *, {_COND_CASE} AS condition FROM drawn
), model AS (
  SELECT *, {_MULT_CASE} AS weather_mult FROM cond
)
SELECT grid_date, hour, temperature_c, condition,
  LEAST(0.8, ROUND(0.15 * rush_mult * weather_mult * holiday_mult, 6))
    AS delay_probability,
  ROUND(GREATEST(1.0, LEAST(120.0,
    (CASE WHEN u2 < 0.6 THEN 1.0 + u2 / 0.6 * 4.0
          WHEN u2 < 0.85 THEN 6.0 + (u2 - 0.6) / 0.25 * 9.0
          ELSE 16.0 + (u2 - 0.85) / 0.15 * 29.0 END)
    * (1.0 + (weather_mult - 1.0) * 0.5))), 4) AS delay_magnitude_min
FROM model
""",
)
def synthetic_weather_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = spark.range(_GRID_DAYS).select(F.col("id").alias("day_index"))
    hours = spark.range(24).select(F.col("id").alias("hour"))
    grid = days.crossJoin(hours).withColumn(  # J10 grid, F7 series
        "cell_key", F.col("day_index") * 24 + F.col("hour") + 1
    )
    two_pi = 2 * math.pi
    drawn = grid.select(
        "day_index",
        "hour",
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("day_index").cast("int"))
        .cast("timestamp")
        .alias("grid_date"),
        F.round(
            10.0
            + 15.0 * F.sin(F.lit(two_pi) * ((F.col("day_index") + 1) - 81) / 365.0)
            + 5.0 * F.sin(F.lit(two_pi) * (F.col("hour") - 9) / 24.0),
            4,
        ).alias("temperature_c"),
        _uniform_col(F.col("cell_key"), _H1).alias("u1"),
        _uniform_col(F.col("cell_key"), _H2).alias("u2"),
        F.when(F.col("hour").isin(7, 8, 9, 17, 18, 19), 1.8).otherwise(1.0).alias("rush_mult"),
        F.when(F.col("day_index") == 0, 0.7).otherwise(1.0).alias("holiday_mult"),
    )
    model = drawn.withColumn("condition", F.expr(_COND_CASE)).withColumn(
        "weather_mult", F.expr(_MULT_CASE)
    )
    magnitude = (
        F.when(F.col("u2") < 0.6, 1.0 + F.col("u2") / 0.6 * 4.0)
        .when(F.col("u2") < 0.85, 6.0 + (F.col("u2") - 0.6) / 0.25 * 9.0)
        .otherwise(16.0 + (F.col("u2") - 0.85) / 0.15 * 29.0)
    ) * (1.0 + (F.col("weather_mult") - 1.0) * 0.5)
    return model.select(
        "grid_date",
        "hour",
        "temperature_c",
        "condition",
        F.least(
            F.lit(0.8),
            F.round(
                0.15 * F.col("rush_mult") * F.col("weather_mult") * F.col("holiday_mult"), 6
            ),
        ).alias("delay_probability"),
        F.round(
            F.greatest(F.lit(1.0), F.least(F.lit(120.0), magnitude)), 4
        ).alias("delay_magnitude_min"),
    )


@register(
    "ml_gbt_cv_metrics",
    ops=("D6", "D7", "O2"),
    oracle=None,  # model training is not SQL-expressible → rows-only
    bench=False,  # excluded from the headline timing suite
    doc="XGBoost + GridSearchCV (`train_delay_model.py:274-355`) as "
    "SparkML GBTRegressor + ParamGridBuilder/CrossValidator; tolerance "
    "accuracy per `train_delay_model.py:400-416`. Deterministic "
    "hash-split and seeded sampling replace ORDER BY RANDOM(). Returns "
    "one metrics row (schema-stable; values depend on the fitted model).",
)
def ml_gbt_cv_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml import Pipeline
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.feature import StringIndexer, VectorAssembler
    from pyspark.ml.regression import GBTRegressor
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    feats = l.join(
        F.broadcast(p), l.l_partkey == p.p_partkey
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "p_retailprice",  # the dominant price driver — feature join
        F.month("l_shipdate").alias("ship_month"),
        (F.dayofweek("l_shipdate") - 1).alias("ship_dow"),
        "l_extendedprice",
    )
    # Deterministic keyed-hash sample (the scalable ORDER BY RANDOM()):
    # take ~20% of rows, then hash-split 80/20 into train/test.
    u = (
        F.abs(F.hash(F.col("l_orderkey") * 7 + F.col("l_linenumber"))) % 1000
    ) / 1000.0
    sampled = feats.withColumn("u", u).filter(F.col("u") < 0.2)
    train_df = sampled.filter(F.col("u") < 0.16)
    test_df = sampled.filter(F.col("u") >= 0.16)

    pipe = Pipeline(
        stages=[
            StringIndexer(
                inputCol="l_returnflag", outputCol="flag_idx", handleInvalid="keep"
            ),
            VectorAssembler(
                inputCols=[
                    "flag_idx",
                    "l_quantity",
                    "l_discount",
                    "l_tax",
                    "p_retailprice",
                    "ship_month",
                    "ship_dow",
                ],
                outputCol="features",
            ),
            GBTRegressor(
                labelCol="l_extendedprice",
                featuresCol="features",
                maxIter=5,
                stepSize=0.1,
                seed=42,
            ),
        ]
    )
    gbt = pipe.getStages()[-1]
    grid = ParamGridBuilder().addGrid(gbt.maxDepth, [3, 4]).build()
    evaluator = RegressionEvaluator(
        labelCol="l_extendedprice", predictionCol="prediction", metricName="rmse"
    )
    cv = CrossValidator(
        estimator=pipe,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        numFolds=2,
        seed=42,
        parallelism=2,
    )
    model = cv.fit(train_df)
    preds = model.transform(test_df)
    mae = RegressionEvaluator(
        labelCol="l_extendedprice", predictionCol="prediction", metricName="mae"
    ).evaluate(preds)
    rmse = evaluator.evaluate(preds)
    tol = preds.agg(
        F.avg(
            (
                F.abs(F.col("prediction") - F.col("l_extendedprice"))
                <= 0.25 * F.col("l_extendedprice")
            ).cast("double")
        )
    ).first()[0]
    best_depth = model.bestModel.stages[-1].getMaxDepth()
    return spark.createDataFrame(
        [
            (
                train_df.count(),
                test_df.count(),
                float(rmse),
                float(mae),
                float(tol),
                int(best_depth),
            )
        ],
        "n_train long, n_test long, rmse double, mae double, acc_25pct double, best_max_depth int",
    )
