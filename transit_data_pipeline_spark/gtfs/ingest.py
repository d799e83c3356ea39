"""GTFS ingest: CSV → staging → cleansed operational tables
(ref `sql/load_gtfs_data.sql`), all declarative DataFrame plans.

The plpgsql time parser (`create_schema.sql:199-221`) becomes a pure
column expression — stays inside whole-stage codegen, no UDF. Upsert
semantics (`ON CONFLICT DO NOTHING`, `load_gtfs_data.sql:139,...`)
become deterministic first-wins dedup + left-anti append.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schemas as S


def gtfs_time_to_seconds(col: Column) -> Column:
    """Parse 'HH:MM:SS' (HH may exceed 24) to integer seconds; NULL on
    malformed input. Column-expression port of
    `staging.gtfs_time_to_interval` (`create_schema.sql:199-221`)."""
    ok = col.rlike(r"^\d+:[0-5]\d:[0-5]\d$")
    p = F.split(col, ":")
    secs = (
        p.getItem(0).cast("int") * 3600
        + p.getItem(1).cast("int") * 60
        + p.getItem(2).cast("int")
    )
    return F.when(ok, secs)


def read_staging(spark: SparkSession, csv_dir: str) -> dict[str, DataFrame]:
    """CSV bulk load with declared schemas, empty string as NULL
    (ref COPY ... NULL AS '' `load_gtfs_data.sql:2-84`)."""
    raw = {
        "stops": S.STOPS_RAW,
        "routes": S.ROUTES_RAW,
        "trips": S.TRIPS_RAW,
        "stop_times": S.STOP_TIMES_RAW,
        "calendar": S.CALENDAR_RAW,
        "weather": S.WEATHER,
        "delay_events": S.DELAY_EVENTS,
    }
    return {
        name: spark.read.csv(
            os.path.join(csv_dir, f"{name}.csv"),
            header=True,
            schema=schema,
            nullValue="",
        )
        for name, schema in raw.items()
    }


def quality_audits(staging: dict[str, DataFrame]) -> DataFrame:
    """The reference's four inline post-load audits
    (`load_gtfs_data.sql:86-114`) as one UNION ALL report."""
    spark = staging["stops"].sparkSession
    checks = [
        staging["stops"]
        .filter(F.col("stop_lat").isNull() | F.col("stop_lon").isNull())
        .agg(F.lit("stops_null_coordinates").alias("check"), F.count(F.lit(1)).alias("n")),
        staging["trips"]
        .join(staging["routes"], "route_id", "left_anti")
        .agg(F.lit("trips_orphan_route").alias("check"), F.count(F.lit(1)).alias("n")),
        staging["stop_times"]
        .filter(gtfs_time_to_seconds(F.col("arrival_time")).isNull())
        .agg(F.lit("stop_times_invalid_arrival").alias("check"), F.count(F.lit(1)).alias("n")),
        staging["calendar"].agg(
            F.lit("calendar_services").alias("check"), F.count(F.lit(1)).alias("n")
        ),
    ]
    return reduce(DataFrame.unionByName, checks)


def _dedup_first(df: DataFrame, keys: list[str], order: list[str]) -> DataFrame:
    """ON CONFLICT DO NOTHING: keep the first row per key under a
    deterministic order (SURVEY §7 trap: never dropDuplicates)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def build_operational(staging: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """staging → operational: cleansing, defaults, FK-validation joins,
    time parsing (ref `load_gtfs_data.sql:119-239`)."""
    stops = (
        staging["stops"]
        .filter(F.col("stop_lat").isNotNull() & F.col("stop_lon").isNotNull())
        .withColumn("wheelchair_boarding", F.coalesce("wheelchair_boarding", F.lit(0)))
    )
    stops = _dedup_first(stops, ["stop_id"], ["stop_name"])

    routes = (
        staging["routes"]
        .withColumn("route_color", F.coalesce("route_color", F.lit("FFFFFF")))
        .withColumn("route_text_color", F.coalesce("route_text_color", F.lit("000000")))
    )
    routes = _dedup_first(routes, ["route_id"], ["route_short_name"])

    # FK-validation inner join drops orphan trips (ref :185)
    trips = (
        staging["trips"]
        .join(routes.select("route_id"), "route_id")
        .withColumn("direction_id", F.coalesce("direction_id", F.lit(0)))
    )
    trips = _dedup_first(trips, ["trip_id"], ["route_id"])

    stop_times = (
        staging["stop_times"]
        .withColumn("arrival_s", gtfs_time_to_seconds(F.col("arrival_time")))
        .withColumn("departure_s", gtfs_time_to_seconds(F.col("departure_time")))
        .filter(F.col("arrival_s").isNotNull())  # ref :211
        .join(trips.select("trip_id"), "trip_id")
        .join(stops.select("stop_id"), "stop_id")
        .withColumn("timepoint", F.coalesce("timepoint", F.lit(1)))
        .drop("arrival_time", "departure_time")
    )
    stop_times = _dedup_first(stop_times, ["trip_id", "stop_sequence"], ["stop_id"])

    calendar = staging["calendar"]
    for d in ("monday", "tuesday", "wednesday", "thursday", "friday", "saturday", "sunday"):
        calendar = calendar.withColumn(d, F.col(d).cast("boolean"))

    delay_events = (
        staging["delay_events"]
        .join(trips.select("trip_id"), "trip_id")
        .join(stops.select("stop_id"), "stop_id")
    )

    return {
        "stops": stops,
        "routes": routes,
        "trips": trips,
        "stop_times": stop_times,
        "calendar": calendar,
        "weather": staging["weather"],
        "delay_events": delay_events,
    }


def reconciliation_counts(
    staging: dict[str, DataFrame], operational: dict[str, DataFrame]
) -> DataFrame:
    """Staging-vs-operational row counts (ref `load_gtfs_data.sql:241-276`)."""
    rows = []
    for name in ("stops", "routes", "trips", "stop_times", "calendar"):
        rows.append(
            staging[name].agg(
                F.lit(name).alias("table_name"),
                F.lit("staging").alias("layer"),
                F.count(F.lit(1)).alias("n_rows"),
            )
        )
        rows.append(
            operational[name].agg(
                F.lit(name).alias("table_name"),
                F.lit("operational").alias("layer"),
                F.count(F.lit(1)).alias("n_rows"),
            )
        )
    return reduce(DataFrame.unionByName, rows)


def upsert_ignore_duplicates(
    existing: DataFrame, incoming: DataFrame, keys: list[str]
) -> DataFrame:
    """Idempotent append: ON CONFLICT (key) DO NOTHING as
    left-anti + unionByName (ref `load_gtfs_data.sql:139` sites;
    Delta MERGE WHEN NOT MATCHED on a real lakehouse)."""
    fresh = incoming.join(existing.select(*keys), keys, "left_anti")
    return existing.unionByName(fresh)
