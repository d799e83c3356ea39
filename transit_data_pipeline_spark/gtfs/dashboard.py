"""Dashboard query library (ref `streamlit_dashboard.py` — entry path
3a in SURVEY §3): each widget's per-pageload SQL becomes a pure
DataFrame function over the operational/ML frames, parameterized by
the date range the reference interpolates into its SQL strings.

The reference opens a fresh connection per widget with no caching
(`streamlit_dashboard.py:26-32`); here a serving layer would call
these functions against cached DataFrames — same results, one session.
All date filtering is `to_date(actual_arrival) BETWEEN lo AND hi`,
matching the reference's `DATE(actual_arrival) BETWEEN ...`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _in_range(df: DataFrame, start_date: str, end_date: str) -> DataFrame:
    d = F.to_date("actual_arrival")
    return df.filter(d.between(F.lit(start_date), F.lit(end_date)))


def route_options(dim_route: DataFrame) -> DataFrame:
    """Sidebar route filter (ref `:72`): DISTINCT route ids, ordered."""
    return dim_route.select("route_id").distinct().orderBy("route_id")


def kpi_metrics(delay_events: DataFrame, start_date: str, end_date: str) -> DataFrame:
    """The four KPI tiles in one pass (ref `:84-129` runs four separate
    queries over the same rows; one aggregation computes all of them).
    high_risk_delays uses the dashboard's `delay_minutes > 20`."""
    return _in_range(delay_events, start_date, end_date).agg(
        F.count(F.lit(1)).alias("total_delays"),
        F.coalesce(F.avg("delay_minutes"), F.lit(0.0)).alias("avg_delay"),
        F.count(F.when(F.col("delay_minutes") > 20, 1)).alias("high_risk_delays"),
    )


def daily_trend(delay_events: DataFrame, start_date: str, end_date: str) -> DataFrame:
    """Daily delay trend (ref `:151-161`)."""
    return (
        _in_range(delay_events, start_date, end_date)
        .groupBy(F.to_date("actual_arrival").alias("date"))
        .agg(
            F.count(F.lit(1)).alias("delay_count"),
            F.avg("delay_minutes").alias("avg_delay"),
            F.max("delay_minutes").alias("max_delay"),
        )
        .orderBy("date")
    )


def top_routes(
    delay_events: DataFrame, trips: DataFrame, start_date: str, end_date: str, k: int = 10
) -> DataFrame:
    """Top-k routes by delay count (ref `:205-217`), route resolved via
    the trips join; deterministic tiebreak on route_id. trips is NOT
    broadcast-hinted: it is not a bounded dimension (it grows with
    network size), so join strategy is left to Catalyst/AQE."""
    return (
        _in_range(delay_events, start_date, end_date)
        .join(trips.select("trip_id", "route_id"), "trip_id")
        .groupBy("route_id")
        .agg(
            F.count(F.lit(1)).alias("delay_count"),
            F.avg("delay_minutes").alias("avg_delay"),
            F.max("delay_minutes").alias("max_delay"),
        )
        .orderBy(F.col("delay_count").desc(), "route_id")
        .limit(k)
    )


def hourly_pattern(delay_events: DataFrame, start_date: str, end_date: str) -> DataFrame:
    """Average delay by hour of day (ref `:250-259`). The reference
    extracts the hour from actual_arrival timestamps."""
    return (
        _in_range(delay_events, start_date, end_date)
        .groupBy(F.hour("actual_arrival").cast("int").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("delay_count"),
            F.avg("delay_minutes").alias("avg_delay"),
        )
        .orderBy("hour")
    )


def weather_impact(delay_events: DataFrame, start_date: str, end_date: str) -> DataFrame:
    """Delay stats per weather condition, worst first (ref `:287-297`)."""
    return (
        _in_range(delay_events, start_date, end_date)
        .groupBy("weather_condition")
        .agg(
            F.count(F.lit(1)).alias("delay_count"),
            F.avg("delay_minutes").alias("avg_delay"),
            F.max("delay_minutes").alias("max_delay"),
        )
        .orderBy(F.col("avg_delay").desc(), "weather_condition")
    )


def recent_predictions(predictions: DataFrame, k: int = 20) -> DataFrame:
    """Latest predictions for the dashboard table (ref `:378-390`):
    most recent first, deterministic tiebreak."""
    return predictions.orderBy(
        F.col("created_at").desc(), F.col("trip_id"), F.col("stop_id")
    ).limit(k)
