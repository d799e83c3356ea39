"""Star-schema warehouse build (ref `sql/fact_dim_tables.sql`): six
dimensions + delay fact + two aggregate facts, plus the three
"materialized views" (`performance_optimization.sql:28-91`) as
overwrite-mode parquet jobs.

Spark-first choices (SURVEY §4): surrogate keys are ROW_NUMBER over
the natural key (deterministic across runs — never
monotonically_increasing_id); dims are broadcast at join sites; the
fact is written partitioned by date_key (the index-replacement layout:
partition pruning + parquet min/max stats replace the reference's 24
B-tree indexes). Correlated scalar subqueries in the reference
(`:233-242,268-280,294,328-329`) are decorrelated into
groupBy+join by construction.

Deliberately replicated quirks (SURVEY §7): delay_category uses
BETWEEN 1 AND 5 / 6-15 / 16-30 ELSE 'Extreme' (so delay=0 → 'Extreme',
`fact_dim_tables.sql:335-340`); dim_date weekend is PG DOW IN (0,6)
(`:171`) while delay_events.day_of_week stays Python 0=Monday.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .schemas import WEATHER_CONDITIONS

#: condition → (severity_level, impact_category) — dim_weather seed
#: rows, values verbatim from `fact_dim_tables.sql:299-308`.
WEATHER_SEVERITY = {
    "clear": (1, "Low Impact"),
    "partly_cloudy": (1, "Low Impact"),
    "cloudy": (1, "Low Impact"),
    "rainy": (2, "Medium Impact"),
    "heavy_rain": (3, "High Impact"),
    "snow": (3, "High Impact"),
    "fog": (2, "Medium Impact"),
    "windy": (2, "Medium Impact"),
}


def _date_key(c) -> F.Column:
    return F.date_format(c, "yyyyMMdd").cast("int")


def build_dim_date(delay_events: DataFrame) -> DataFrame:
    """Calendar dimension spanning min→max event dates via
    sequence+explode (ref generate_series `fact_dim_tables.sql:179-183`)."""
    bounds = delay_events.agg(
        F.min(F.to_date("actual_arrival")).alias("lo"),
        F.max(F.to_date("actual_arrival")).alias("hi"),
    )
    days = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("full_date")
    )
    d = F.col("full_date")
    pg_dow = (F.dayofweek(d) - 1).cast("int")  # PG: 0=Sunday
    month = F.month(d)
    # Holiday flag via the reference's semi-join update (J9,
    # `fact_dim_tables.sql:186-192`): date_key IN (SELECT ... WHERE
    # is_holiday) — as a broadcast left join + null test, no mutation.
    holidays = (
        delay_events.filter(F.col("is_holiday"))
        .select(_date_key(F.to_date("actual_arrival")).alias("date_key"))
        .distinct()
        .withColumn("hflag", F.lit(True))
    )
    return (
        days.select(
            _date_key(d).alias("date_key"),
            d.alias("full_date"),
            F.year(d).cast("int").alias("year"),
            F.quarter(d).cast("int").alias("quarter"),
            month.cast("int").alias("month"),
            F.date_format(d, "MMMM").alias("month_name"),
            F.weekofyear(d).cast("int").alias("week_of_year"),
            F.dayofmonth(d).cast("int").alias("day_of_month"),
            pg_dow.alias("day_of_week"),
            F.date_format(d, "EEEE").alias("day_name"),
            pg_dow.isin(0, 6).alias("is_weekend"),
            F.when(month.isin(12, 1, 2), "Winter")
            .when(month.isin(3, 4, 5), "Spring")
            .when(month.isin(6, 7, 8), "Summer")
            .otherwise("Fall")
            .alias("season"),
        )
        .join(F.broadcast(holidays), "date_key", "left")
        .withColumn("is_holiday", F.coalesce("hflag", F.lit(False)))
        .drop("hflag")
    )


def build_dim_time(spark: SparkSession) -> DataFrame:
    """Fixed 96-row time dimension: 24 hours × 15-minute buckets via
    cross join (ref `fact_dim_tables.sql:215-217`)."""
    hours = spark.range(24).select(F.col("id").cast("int").alias("hour"))
    minutes = spark.createDataFrame([(0,), (15,), (30,), (45,)], "minute int")
    h, m = F.col("hour"), F.col("minute")
    return hours.crossJoin(minutes).select(
        (h * 100 + m).alias("time_key"),
        h.alias("hour"),
        m.alias("minute"),
        F.when(h.between(5, 11), "Morning")
        .when(h.between(12, 16), "Afternoon")
        .when(h.between(17, 20), "Evening")
        .otherwise("Night")
        .alias("time_of_day"),
        (h.between(7, 9) | h.between(17, 19)).alias("is_rush_hour"),
        F.when(h.between(7, 9), "Morning Rush")
        .when(h.between(17, 19), "Evening Rush")
        .otherwise("Off Peak")
        .alias("rush_hour_period"),
    )


def build_dim_stop(stops: DataFrame, stop_times: DataFrame, trips: DataFrame) -> DataFrame:
    """Stop dimension with decorrelated hub/centrality attributes
    (ref correlated subqueries `fact_dim_tables.sql:233-242` →
    groupBy+join)."""
    routes_per_stop = (
        stop_times.join(trips.select("trip_id", "route_id"), "trip_id")
        .groupBy("stop_id")
        .agg(F.countDistinct("route_id").alias("n_routes"))
    )
    w = Window.orderBy("stop_id")
    avg_lat = stops.agg(F.avg("stop_lat").alias("city_avg_lat"))
    return (
        stops.join(routes_per_stop, "stop_id", "left")
        .crossJoin(F.broadcast(avg_lat))
        .select(
            F.row_number().over(w).alias("stop_key"),
            "stop_id",
            "stop_name",
            "stop_lat",
            "stop_lon",
            F.coalesce("n_routes", F.lit(0)).alias("n_routes"),
            (F.coalesce("n_routes", F.lit(0)) >= 3).alias("is_hub"),
            (F.col("stop_lat") > F.col("city_avg_lat")).alias("is_north"),
            (F.col("wheelchair_boarding") == 1).alias("is_accessible"),
        )
    )


ROUTE_TYPE_DESC = {0: "Tram", 1: "Subway", 2: "Rail", 3: "Bus"}


def build_dim_route(routes: DataFrame, trips: DataFrame, stop_times: DataFrame) -> DataFrame:
    """Route dimension; avg trip duration is the reference's two-level
    aggregate (per-trip max−min → per-route avg,
    `fact_dim_tables.sql:268-280`)."""
    per_trip = (
        stop_times.groupBy("trip_id")
        .agg((F.max("arrival_s") - F.min("arrival_s")).alias("trip_duration_s"))
        .filter(F.col("trip_duration_s") > 0)  # HAVING ... > 0 (ref :278)
        .join(trips.select("trip_id", "route_id"), "trip_id")
    )
    per_route = per_trip.groupBy("route_id").agg(
        F.avg("trip_duration_s").alias("avg_trip_duration_s"),
        F.countDistinct("trip_id").alias("n_trips"),
    )
    type_desc = F.create_map(
        *[F.lit(x) for kv in ROUTE_TYPE_DESC.items() for x in kv]
    )
    w = Window.orderBy("route_id")
    return (
        routes.join(per_route, "route_id", "left")
        .select(
            F.row_number().over(w).alias("route_key"),
            "route_id",
            "route_short_name",
            "route_long_name",
            "route_type",
            F.coalesce(type_desc[F.col("route_type")], F.lit("Other")).alias(
                "route_type_desc"
            ),
            F.coalesce("avg_trip_duration_s", F.lit(0.0)).alias("avg_trip_duration_s"),
            F.coalesce("n_trips", F.lit(0)).alias("n_trips"),
        )
    )


def build_dim_trip(trips: DataFrame, stop_times: DataFrame) -> DataFrame:
    """Trip dimension; total_stops decorrelated (ref `:294`)."""
    per_trip = stop_times.groupBy("trip_id").agg(
        F.count(F.lit(1)).alias("total_stops"),
        F.min("arrival_s").alias("first_arrival_s"),
    )
    w = Window.orderBy("trip_id")
    return trips.join(per_trip, "trip_id", "left").select(
        F.row_number().over(w).alias("trip_key"),
        "trip_id",
        "route_id",
        "service_id",
        "direction_id",
        F.coalesce("total_stops", F.lit(0)).alias("total_stops"),
        F.coalesce(
            ((F.col("first_arrival_s") / 3600).cast("int") % 24), F.lit(0)
        ).alias("start_hour"),
    )


def build_dim_weather(spark: SparkSession) -> DataFrame:
    """Eight seeded weather rows (ref `fact_dim_tables.sql:299-308`)."""
    rows = [
        (i + 1, c, WEATHER_SEVERITY[c][0], WEATHER_SEVERITY[c][1])
        for i, c in enumerate(WEATHER_CONDITIONS)
    ]
    return spark.createDataFrame(
        rows, "weather_key int, weather_condition string, severity int, impact_category string"
    )


def build_fact(
    delay_events: DataFrame,
    stop_times: DataFrame,
    dim_stop: DataFrame,
    dim_trip: DataFrame,
    dim_route: DataFrame,
    dim_weather: DataFrame,
) -> DataFrame:
    """Delay fact: five-way join with broadcast dims + smart keys +
    derived measures (ref `fact_dim_tables.sql:312-345`)."""
    e = delay_events
    seq = stop_times.select("trip_id", "stop_id", "stop_sequence")
    minute15 = (F.floor(F.minute("actual_arrival") / 15) * 15).cast("int")
    cat = F.col("delay_minutes")
    return (
        e.join(F.broadcast(dim_stop.select("stop_key", "stop_id")), "stop_id")
        # dim_trip grows with the network (one row per trip) — no
        # forced broadcast; AQE decides from runtime sizes.
        .join(dim_trip.select("trip_key", "trip_id", "route_id"), "trip_id")
        .join(F.broadcast(dim_route.select("route_key", "route_id")), "route_id")
        .join(
            F.broadcast(dim_weather.select("weather_key", "weather_condition", "severity")),
            "weather_condition",
            "left",
        )
        .join(seq, ["trip_id", "stop_id"], "left")
        .select(
            F.col("id").alias("event_id"),
            _date_key(F.col("actual_arrival")).alias("date_key"),
            (F.hour("actual_arrival") * 100 + minute15).alias("time_key"),
            "stop_key",
            "trip_key",
            "route_key",
            "weather_key",
            F.coalesce("stop_sequence", F.lit(0)).alias("stop_sequence"),
            "delay_minutes",
            # ref quirk: BETWEEN 1 AND 5 ... ELSE 'Extreme' → 0 is Extreme
            F.when(cat.between(1, 5), "Minor")
            .when(cat.between(6, 15), "Moderate")
            .when(cat.between(16, 30), "Severe")
            .otherwise("Extreme")
            .alias("delay_category"),
            (cat <= 5).alias("is_on_time"),
            "is_holiday",
            F.coalesce("severity", F.lit(1)).alias("weather_severity"),
        )
    )


def build_agg_daily_route(fact: DataFrame, dim_route: DataFrame) -> DataFrame:
    """Daily route performance aggregate fact with bounded on-time %
    (ref `fact_dim_tables.sql:350-368`: LEAST(100, GREATEST(0, ...)))."""
    return (
        fact.join(F.broadcast(dim_route.select("route_key", "route_id")), "route_key")
        .groupBy("date_key", "route_id")
        .agg(
            F.count(F.lit(1)).alias("n_delays"),
            F.countDistinct("trip_key").alias("n_trips_delayed"),
            F.avg("delay_minutes").alias("avg_delay_minutes"),
            F.max("delay_minutes").alias("max_delay_minutes"),
            F.sum(F.when(F.col("delay_minutes") > 15, 1).otherwise(0)).alias(
                "n_major_delays"
            ),
            F.least(
                F.lit(100.0),
                F.greatest(
                    F.lit(0.0),
                    F.sum(F.when(F.col("is_on_time"), 1).otherwise(0)) * 100.0
                    / F.count(F.lit(1)),
                ),
            ).alias("on_time_pct"),
        )
    )


def build_agg_hourly_stop(fact: DataFrame, dim_stop: DataFrame) -> DataFrame:
    """Hourly stop aggregate fact (ref `fact_dim_tables.sql:372-380`)."""
    return (
        fact.join(F.broadcast(dim_stop.select("stop_key", "stop_id")), "stop_key")
        .groupBy("date_key", (F.col("time_key") / 100).cast("int").alias("hour"), "stop_id")
        .agg(
            F.count(F.lit(1)).alias("n_delays"),
            F.avg("delay_minutes").alias("avg_delay_minutes"),
        )
    )


def build_warehouse(operational: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Full star build in dependency order (ref `README.md:103-135`)."""
    spark = operational["stops"].sparkSession
    dim_date = build_dim_date(operational["delay_events"])
    dim_time = build_dim_time(spark)
    dim_stop = build_dim_stop(
        operational["stops"], operational["stop_times"], operational["trips"]
    )
    dim_route = build_dim_route(
        operational["routes"], operational["trips"], operational["stop_times"]
    )
    dim_trip = build_dim_trip(operational["trips"], operational["stop_times"])
    dim_weather = build_dim_weather(spark)
    fact = build_fact(
        operational["delay_events"],
        operational["stop_times"],
        dim_stop,
        dim_trip,
        dim_route,
        dim_weather,
    )
    return {
        "dim_date": dim_date,
        "dim_time": dim_time,
        "dim_stop": dim_stop,
        "dim_route": dim_route,
        "dim_trip": dim_trip,
        "dim_weather": dim_weather,
        "fact_delay_events": fact,
        "agg_daily_route": build_agg_daily_route(fact, dim_route),
        "agg_hourly_stop": build_agg_hourly_stop(fact, dim_stop),
    }


def persist_warehouse(wh: dict[str, DataFrame], out_dir: str) -> None:
    """Write the warehouse: fact partitioned by date_key (partition
    pruning replaces the reference's B-tree indexes, SURVEY §4),
    dims plain parquet."""
    for name, df in wh.items():
        writer = df.write.mode("overwrite")
        if name == "fact_delay_events":
            writer = writer.partitionBy("date_key")
        writer.parquet(f"{out_dir}/{name}")


def refresh_materialized_views(wh: dict[str, DataFrame], out_dir: str) -> None:
    """The three analytics MVs (`performance_optimization.sql:28-91`):
    recompute + overwrite = REFRESH."""
    fact, dim_route, dim_date = (
        wh["fact_delay_events"],
        wh["dim_route"],
        wh["dim_date"],
    )
    mv_route_perf = (
        fact.join(F.broadcast(dim_route.select("route_key", "route_id", "route_type_desc")), "route_key")
        .groupBy("route_id", "route_type_desc")
        .agg(
            F.count(F.lit(1)).alias("total_delays"),
            F.avg("delay_minutes").alias("avg_delay"),
            F.count(F.when(F.col("delay_minutes") > 15, 1)).alias("major_delays"),
            F.expr("percentile(delay_minutes, 0.5)").alias("median_delay"),
        )
    )
    mv_daily_summary = (
        fact.join(F.broadcast(dim_date.select("date_key", "full_date", "is_weekend")), "date_key")
        .groupBy("full_date", "is_weekend")
        .agg(
            F.count(F.lit(1)).alias("total_delays"),
            F.avg("delay_minutes").alias("avg_delay"),
            F.count(F.when(F.col("delay_minutes") > 20, 1)).alias("severe_delays"),
        )
    )
    mv_weather_impact = (
        fact.groupBy("weather_severity")
        .agg(
            F.count(F.lit(1)).alias("total_delays"),
            F.avg("delay_minutes").alias("avg_delay"),
            F.count(F.when(F.col("delay_minutes") > 15, 1)).alias("major_delays"),
        )
    )
    for name, df in (
        ("mv_route_performance", mv_route_perf),
        ("mv_daily_summary", mv_daily_summary),
        ("mv_weather_impact", mv_weather_impact),
    ):
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}")
