"""The reference's nine analytical queries
(`sql/analysis_queries.sql:1-369`) as DataFrame functions over the
star schema. Each takes the warehouse dict and returns a DataFrame;
dims are broadcast, windows keep the reference's partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

Wh = dict[str, DataFrame]


def _joined(wh: Wh) -> DataFrame:
    return (
        wh["fact_delay_events"]
        .join(F.broadcast(wh["dim_date"]), "date_key")
        .join(F.broadcast(wh["dim_route"].select("route_key", "route_id", "route_type_desc")), "route_key")
    )


def q1_route_ranking_trends(wh: Wh) -> DataFrame:
    """Weekly worst-route ranking with prior-week LAG
    (ref `analysis_queries.sql:1-50`)."""
    weekly = (
        _joined(wh)
        .groupBy("route_id", "year", F.col("week_of_year").alias("week"))
        .agg(
            F.avg("delay_minutes").alias("avg_delay"),
            F.count(F.lit(1)).alias("n_delays"),
            F.sum(F.when(F.col("delay_minutes") > 15, 1).otherwise(0)).alias("n_major"),
        )
    )
    trend = Window.partitionBy("route_id").orderBy("year", "week")
    rank = Window.partitionBy("year", "week").orderBy(
        F.col("avg_delay").desc(), F.col("route_id")
    )
    return (
        weekly.withColumn(
            "prev_week_avg_delay",
            F.coalesce(F.lag("avg_delay").over(trend), F.lit(0.0)),
        )
        .withColumn("performance_rank", F.row_number().over(rank))
        .filter(F.col("performance_rank") <= 5)
        .orderBy("year", "week", "performance_rank")
    )


def q2_daily_trend_ma7(wh: Wh) -> DataFrame:
    """Daily system trend with 7-day moving averages of two measures
    (ref `analysis_queries.sql:90-97`)."""
    daily = (
        wh["fact_delay_events"]
        .join(F.broadcast(wh["dim_date"].select("date_key", "full_date")), "date_key")
        .groupBy("full_date")
        .agg(
            F.count(F.lit(1)).alias("n_delays"),
            F.avg("delay_minutes").alias("avg_delay"),
        )
    )
    w = Window.orderBy("full_date").rowsBetween(-6, 0)
    return daily.select(
        "full_date",
        "n_delays",
        "avg_delay",
        F.avg("n_delays").over(w).alias("ma7_n_delays"),
        F.avg("avg_delay").over(w).alias("ma7_avg_delay"),
    )


def q3_stop_hotspots(wh: Wh) -> DataFrame:
    """Stop hotspot percentile + cumulative delay share
    (ref `analysis_queries.sql:113-130`)."""
    per_stop = (
        wh["fact_delay_events"]
        .join(F.broadcast(wh["dim_stop"].select("stop_key", "stop_id", "stop_name", "is_hub")), "stop_key")
        .groupBy("stop_id", "stop_name", "is_hub")
        .agg(
            F.sum("delay_minutes").alias("total_delay_minutes"),
            F.count(F.lit(1)).alias("n_delays"),
        )
    )
    order_w = Window.orderBy(F.col("total_delay_minutes").desc(), F.col("stop_id"))
    run_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    total = Window.partitionBy()
    return (
        per_stop.withColumn("delay_pct_rank", F.percent_rank().over(order_w))
        .withColumn(
            "cumulative_share",
            F.sum("total_delay_minutes").over(run_w)
            / F.sum("total_delay_minutes").over(total)
            * 100.0,
        )
        .orderBy(F.col("total_delay_minutes").desc(), "stop_id")
        .limit(25)
    )


def q4_day_of_week_pattern(wh: Wh) -> DataFrame:
    """Day-of-week pattern: LAG prior day + vs-week-average OVER ()
    (ref `analysis_queries.sql:142-161`)."""
    per_day = (
        _joined(wh)
        .groupBy("day_of_week", "day_name")
        .agg(F.avg("delay_minutes").alias("avg_delay"), F.count(F.lit(1)).alias("n_delays"))
    )
    w = Window.orderBy("day_of_week")
    return per_day.select(
        "day_of_week",
        "day_name",
        "avg_delay",
        "n_delays",
        F.lag("avg_delay").over(w).alias("prev_day_avg"),
        (F.col("avg_delay") - F.avg("avg_delay").over(Window.partitionBy())).alias(
            "vs_week_avg"
        ),
    )


def q5_monthly_quartiles(wh: Wh) -> DataFrame:
    """Monthly trend, 3-month MA, NTILE(4) quartile
    (ref `analysis_queries.sql:169-189`)."""
    monthly = (
        _joined(wh)
        .groupBy("year", "month", F.trim(F.col("month_name")).alias("month_name"))
        .agg(F.avg("delay_minutes").alias("avg_delay"), F.count(F.lit(1)).alias("n_delays"))
    )
    t = Window.orderBy("year", "month")
    return monthly.select(
        "year",
        "month",
        "month_name",
        "avg_delay",
        "n_delays",
        F.lag("avg_delay").over(t).alias("prev_month_avg"),
        F.avg("avg_delay").over(t.rowsBetween(-2, 0)).alias("ma3_avg_delay"),
        F.ntile(4).over(Window.orderBy(F.col("avg_delay"), F.col("year"), F.col("month"))).alias("delay_quartile"),
    )


def q6_route_stop_hotspots(wh: Wh) -> DataFrame:
    """Within-route DENSE_RANK + system-wide rank, HAVING n>=10
    (ref `analysis_queries.sql:204-240`)."""
    per = (
        wh["fact_delay_events"]
        .join(F.broadcast(wh["dim_route"].select("route_key", "route_id")), "route_key")
        .join(F.broadcast(wh["dim_stop"].select("stop_key", "stop_id")), "stop_key")
        .groupBy("route_id", "stop_id")
        .agg(F.avg("delay_minutes").alias("avg_delay"), F.count(F.lit(1)).alias("n_delays"))
        .filter(F.col("n_delays") >= 10)
    )
    return (
        per.withColumn(
            "route_rank",
            F.dense_rank().over(
                Window.partitionBy("route_id").orderBy(F.col("avg_delay").desc())
            ),
        )
        .withColumn(
            "system_rank",
            F.dense_rank().over(Window.orderBy(F.col("avg_delay").desc())),
        )
        .filter(F.col("system_rank") <= 20)
        .orderBy("system_rank", "route_id", "stop_id")
    )


def q7_delay_cascade(wh: Wh) -> DataFrame:
    """Delay cascade along each trip: previous stop's delay via LAG,
    trend labels (ref `analysis_queries.sql:252-283`)."""
    seq = (
        wh["fact_delay_events"]
        # dim_trip is NOT bounded (one row per trip) — no broadcast
        # hint; AQE decides from runtime sizes.
        .join(wh["dim_trip"].select("trip_key", "trip_id"), "trip_key")
        .join(F.broadcast(wh["dim_stop"].select("stop_key", "stop_name")), "stop_key")
    )
    w = Window.partitionBy("trip_id", "date_key").orderBy("stop_sequence")
    diff = F.col("delay_minutes") - F.col("prev_stop_delay")
    return (
        seq.select(
            "trip_id",
            "date_key",
            "stop_sequence",
            "stop_name",
            "delay_minutes",
            F.lag("delay_minutes").over(w).alias("prev_stop_delay"),
            F.lag("stop_name").over(w).alias("prev_stop_name"),
        )
        .filter(F.col("prev_stop_delay").isNotNull())
        .withColumn(
            "cascade_trend",
            F.when(diff > 2, "Worsening")
            .when(diff < -2, "Recovering")
            .otherwise("Stable"),
        )
    )


def q8_weather_impact(wh: Wh) -> DataFrame:
    """Weather-severity impact with exact percentiles + stddev
    (ref `analysis_queries.sql:293-311`)."""
    return (
        wh["fact_delay_events"]
        .groupBy("weather_severity")
        .agg(
            F.count(F.lit(1)).alias("n_delays"),
            F.avg("delay_minutes").alias("avg_delay"),
            F.stddev("delay_minutes").alias("stddev_delay"),
            F.expr("percentile(delay_minutes, 0.25)").alias("p25"),
            F.expr("percentile(delay_minutes, 0.5)").alias("p50"),
            F.expr("percentile(delay_minutes, 0.75)").alias("p75"),
            F.expr("percentile(delay_minutes, 0.95)").alias("p95"),
            (
                F.sum(F.when(F.col("delay_minutes") > 15, 1).otherwise(0)).cast("double")
                / F.nullif(F.count(F.lit(1)).cast("double"), F.lit(0.0))
                * 100.0
            ).alias("major_delay_pct"),
        )
        .orderBy("weather_severity")
    )


def q9_recent_vs_historical(wh: Wh, as_of_date_key: int) -> DataFrame:
    """Recent-7-day vs historical split in one pass via conditional AVG,
    DESC NULLS LAST ordering (ref `analysis_queries.sql:330-368`).
    'now' is the parameterized as_of date key (SURVEY §7 determinism).
    The recency predicate converts the YYYYMMDD key to a real DATE and
    uses date_sub — integer key arithmetic breaks across month
    boundaries (e.g. as_of 20250803 − 7 = 20250796)."""
    as_of = F.to_date(F.lit(str(as_of_date_key)), "yyyyMMdd")
    recent = (
        F.to_date(F.col("date_key").cast("string"), "yyyyMMdd")
        > F.date_sub(as_of, 7)
    )
    return (
        wh["fact_delay_events"]
        .join(F.broadcast(wh["dim_route"].select("route_key", "route_id")), "route_key")
        .groupBy("route_id")
        .agg(
            F.avg(F.when(recent, F.col("delay_minutes"))).alias("recent_7day_avg"),
            F.avg(F.when(~recent, F.col("delay_minutes"))).alias("historical_avg"),
            F.count(F.lit(1)).alias("n_delays"),
        )
        .withColumn(
            "trend",
            F.when(F.col("recent_7day_avg") > F.col("historical_avg") + 1, "Degrading")
            .when(F.col("recent_7day_avg") < F.col("historical_avg") - 1, "Improving")
            .otherwise("Stable"),
        )
        .orderBy(F.col("recent_7day_avg").desc_nulls_last(), "route_id")
        .limit(30)
    )


ALL_QUERIES = {
    "q1_route_ranking_trends": q1_route_ranking_trends,
    "q2_daily_trend_ma7": q2_daily_trend_ma7,
    "q3_stop_hotspots": q3_stop_hotspots,
    "q4_day_of_week_pattern": q4_day_of_week_pattern,
    "q5_monthly_quartiles": q5_monthly_quartiles,
    "q6_route_stop_hotspots": q6_route_stop_hotspots,
    "q7_delay_cascade": q7_delay_cascade,
    "q8_weather_impact": q8_weather_impact,
}
