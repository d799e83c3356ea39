"""Future-mode prediction (ref `predict_delays.py:196-376`) and model
metrics persistence (ref `train_delay_model.py:468-532`).

The reference builds the future feature frame with a 115-line SQL
string: calendar day-column service resolution (J12), a 100-trip cap,
placeholder weather (no forecast API), per-route-stop historical
averages via correlated subqueries, and zeroes for every other
historical feature. Here the frame is a DataFrame pipeline: the
correlated lookups are decorrelated into one groupBy+join, the trip
cap is deterministic (ordered by trip_id, never an unordered LIMIT),
and the output schema is exactly the training schema of
:mod:`transit_data_pipeline_spark.gtfs.ml`, so
``model.transform(frame)`` works unmodified.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ml import LABEL, NUMERIC, with_risk_level

#: Placeholder forecast, verbatim from `predict_delays.py:258-262`.
PLACEHOLDER_WEATHER = "clear"
PLACEHOLDER_SEVERITY = 1


def build_future_frame(
    operational: dict[str, DataFrame],
    target_date: str,
    max_trips: int = 100,
) -> DataFrame:
    """Feature frame for every stop of every service active on
    ``target_date`` (capped at ``max_trips`` trips)."""
    day = _dt.date.fromisoformat(target_date)
    day_col = day.strftime("%A").lower()  # dynamic column pick (J12)
    target = F.lit(target_date).cast("date")

    cal = operational["calendar"]
    active_services = cal.filter(
        (F.col(day_col) == 1)
        & (F.col("start_date") <= target)
        & (F.col("end_date") >= target)
    ).select("service_id")

    trips = (
        operational["trips"]
        .join(F.broadcast(active_services), "service_id")
        .select("trip_id", "route_id")
        .orderBy("trip_id")  # deterministic cap, not an unordered LIMIT
        .limit(max_trips)
    )
    st = operational["stop_times"].select("trip_id", "stop_id", "stop_sequence", "arrival_s")
    routes = operational["routes"].select("route_id", "route_type")

    max_seq = st.groupBy("trip_id").agg(F.max("stop_sequence").alias("max_seq"))
    # Decorrelated per-(route, stop) history (ref correlated subqueries
    # `predict_delays.py:266-296` — all-time average, as the reference
    # effectively computes with its recency filters commented out).
    hist = (
        operational["delay_events"]
        .join(operational["trips"].select("trip_id", "route_id"), "trip_id")
        .groupBy("route_id", "stop_id")
        .agg(F.avg("delay_minutes").alias("avg_delay_same_route_stop_30d"))
    )

    hour = ((F.col("arrival_s") / 3600).cast("int") % 24)
    py_dow = day.weekday()  # training uses Python 0=Monday
    is_weekend = int(py_dow in (5, 6))
    is_rush = hour.isin(7, 8, 9, 17, 18, 19)

    frame = (
        trips.join(st, "trip_id")
        .join(F.broadcast(routes), "route_id")
        # max_seq is trip-keyed (unbounded) — no forced broadcast;
        # AQE sees the post-cap sizes at runtime.
        .join(max_seq, "trip_id", "left")
        .join(hist, ["route_id", "stop_id"], "left")
        .select(
            "trip_id",
            "route_id",
            "stop_id",
            hour.alias("hour_of_day"),
            F.lit(py_dow).alias("day_of_week"),
            F.lit(day.month).alias("month"),
            F.lit(day.isocalendar()[1]).alias("week_of_year"),
            F.lit(is_weekend).alias("is_weekend"),
            is_rush.cast("int").alias("is_rush_hour"),
            F.lit(0).alias("is_holiday"),  # ref `:236`
            F.lit(PLACEHOLDER_WEATHER).alias("weather_condition"),
            F.lit(PLACEHOLDER_SEVERITY).alias("weather_severity"),
            "route_type",
            F.coalesce("stop_sequence", F.lit(0)).alias("stop_sequence"),
            F.greatest(
                F.lit(0),
                F.coalesce("max_seq", F.lit(0)) - F.coalesce("stop_sequence", F.lit(0)),
            ).alias("stops_remaining"),
            F.lit(is_weekend * PLACEHOLDER_SEVERITY).alias("weekend_weather_interaction"),
            (is_rush.cast("int") * PLACEHOLDER_SEVERITY).alias("rush_weather_interaction"),
            F.coalesce("avg_delay_same_route_stop_30d", F.lit(0.0)).alias(
                "avg_delay_same_route_stop_30d"
            ),
        )
    )
    # Every other historical feature is zeroed (ref `:299-311`).
    for c in NUMERIC:
        if c not in frame.columns:
            frame = frame.withColumn(c, F.lit(0.0))
    return frame.withColumn(LABEL, F.lit(0.0))  # transform() needs the column


def predict_for_date(model, frame: DataFrame, k: int | None = None) -> DataFrame:
    """Score the future frame, attach risk levels, worst first
    (ref risk binning + sink `predict_delays.py:348-376`)."""
    preds = with_risk_level(model.transform(frame)).select(
        "trip_id",
        "route_id",
        "stop_id",
        "hour_of_day",
        "prediction",
        "risk_level",
    )
    out = preds.orderBy(F.col("prediction").desc(), "trip_id", "stop_id")
    return out.limit(k) if k else out


def high_risk_alert(predictions: DataFrame, threshold_min: float = 20.0) -> dict:
    """The DAG's alert gate (ref `ml_pipeline_dag.py:396-449`): flag
    when more than 10 trips are predicted above the threshold."""
    n = (
        predictions.filter(F.col("prediction") > threshold_min)
        .select("trip_id")
        .distinct()
        .count()
    )
    return {"n_high_risk_trips": n, "alert": n > 10}


def save_model_metrics(
    spark, metrics: dict[str, float], model_version: str, trained_at: str, out_dir: str
) -> DataFrame:
    """Persist one metrics row (ref `ml.model_metrics`
    `ml_feature_engineering.sql:103-129`, INSERT at
    `train_delay_model.py:468-532`). ``trained_at`` is a parameter —
    never wall-clock — so runs are reproducible."""
    row = [
        (
            model_version,
            trained_at,
            float(metrics.get("rmse", 0.0)),
            float(metrics.get("mae", 0.0)),
            float(metrics.get("r2", 0.0)),
            float(metrics.get("acc_5min", 0.0)),
            float(metrics.get("acc_10min", 0.0)),
        )
    ]
    df = spark.createDataFrame(
        row,
        "model_version string, trained_at string, rmse double, mae double, "
        "r2 double, acc_5min double, acc_10min double",
    )
    df.write.mode("append").parquet(out_dir)
    return df


def monitor_predictions(
    predictions: DataFrame, actuals: DataFrame, accuracy_floor: float = 0.75
) -> dict:
    """The DAG's monitoring task (ref `ml_pipeline_dag.py:363-394`):
    3-key join of stored predictions to observed delays (J11), MAE and
    ±10-minute accuracy, alert when accuracy drops below the floor."""
    joined = predictions.join(actuals, ["trip_id", "stop_id", "event_date"])
    row = joined.agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.avg(F.abs(F.col("prediction") - F.col("delay_minutes"))).alias("mae"),
        F.avg(
            (F.abs(F.col("prediction") - F.col("delay_minutes")) <= 10.0).cast("double")
        ).alias("acc_10min"),
    ).first()
    n = row.n_matched or 0
    return {
        "n_matched": n,
        "mae": float(row.mae) if n else None,
        "acc_10min": float(row.acc_10min) if n else None,
        "alert": bool(n and row.acc_10min < accuracy_floor),
    }


def retrain_weekly(
    features: DataFrame,
    as_of_date: str,
    window_days: int = 60,
    sample_cap: int = 50_000,
    **train_kwargs,
):
    """The weekly retrain task (ref `ml_pipeline_dag.py:527-599`):
    last-N-days features, capped at ``sample_cap`` rows via the
    deterministic keyed-hash order (the reference's ORDER BY RANDOM()
    LIMIT 50000 at `:536-540`, made reproducible), then a fresh fit."""
    from .ml import train

    as_of = F.lit(as_of_date).cast("date")
    recent = features.filter(
        F.col("event_date") >= F.date_sub(as_of, window_days)
    )
    h = F.md5(F.concat(F.lit("retrain:"), F.col("feature_id").cast("string")))
    capped = recent.orderBy(h, "feature_id").limit(sample_cap)
    return train(capped, **train_kwargs)
