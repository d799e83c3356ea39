"""Declared schemas for every GTFS table — never CSV inference
(reference DDL: `create_schema.sql:8-176`; SURVEY §1 type mapping).

GTFS clock times ("HH:MM:SS", HH may exceed 24) are stored as integer
seconds past midnight (SURVEY §1: matches every downstream use of
EXTRACT(EPOCH ...)); lat/lon kept DOUBLE (the reference's DECIMAL
precision is display-only), booleans are real BooleanType after
cleansing.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


# --- staging (raw CSV shapes; ref create_schema.sql:8-70) -------------------

STOPS_RAW = _s(
    ("stop_id", T.StringType()),
    ("stop_code", T.StringType()),
    ("stop_name", T.StringType()),
    ("stop_lat", T.DoubleType()),
    ("stop_lon", T.DoubleType()),
    ("wheelchair_boarding", T.IntegerType()),
    ("platform_code", T.StringType()),
    ("stop_url", T.StringType()),
)

ROUTES_RAW = _s(
    ("route_id", T.StringType()),
    ("agency_id", T.StringType()),
    ("route_short_name", T.StringType()),
    ("route_long_name", T.StringType()),
    ("route_type", T.IntegerType()),
    ("route_color", T.StringType()),
    ("route_text_color", T.StringType()),
    ("route_sort_order", T.IntegerType()),
)

TRIPS_RAW = _s(
    ("trip_id", T.StringType()),
    ("route_id", T.StringType()),
    ("service_id", T.StringType()),
    ("trip_headsign", T.StringType()),
    ("direction_id", T.IntegerType()),
    ("block_id", T.StringType()),
    ("shape_id", T.StringType()),
    ("wheelchair_accessible", T.IntegerType()),
    ("bikes_allowed", T.IntegerType()),
)

STOP_TIMES_RAW = _s(
    ("trip_id", T.StringType()),
    ("arrival_time", T.StringType()),  # "HH:MM:SS", HH may be >= 24
    ("departure_time", T.StringType()),
    ("stop_id", T.StringType()),
    ("stop_sequence", T.IntegerType()),
    ("stop_headsign", T.StringType()),
    ("shape_dist_traveled", T.DoubleType()),
    ("timepoint", T.IntegerType()),
)

CALENDAR_RAW = _s(
    ("service_id", T.StringType()),
    ("monday", T.IntegerType()),
    ("tuesday", T.IntegerType()),
    ("wednesday", T.IntegerType()),
    ("thursday", T.IntegerType()),
    ("friday", T.IntegerType()),
    ("saturday", T.IntegerType()),
    ("sunday", T.IntegerType()),
    ("start_date", T.DateType()),
    ("end_date", T.DateType()),
)

# --- generated event tables (ref create_schema.sql:151-176) -----------------

WEATHER = _s(
    ("recorded_at", T.TimestampType()),  # UNIQUE per hour
    ("temperature", T.DoubleType()),
    ("precipitation", T.DoubleType()),
    ("wind_speed", T.DoubleType()),
    ("visibility", T.DoubleType()),
    ("weather_condition", T.StringType()),
)

DELAY_EVENTS = _s(
    ("id", T.LongType()),
    ("trip_id", T.StringType()),
    ("stop_id", T.StringType()),
    ("scheduled_arrival", T.IntegerType()),  # seconds past midnight
    ("actual_arrival", T.TimestampType()),
    ("delay_minutes", T.IntegerType()),
    ("weather_condition", T.StringType()),
    ("day_of_week", T.IntegerType()),  # Python convention: 0=Monday
    ("is_holiday", T.BooleanType()),
    ("recorded_at", T.TimestampType()),
)

#: The 8 seeded weather conditions (ref `generate_synthetic_data.py:24-27`,
#: must match dim_weather seeds `fact_dim_tables.sql:300-308`).
WEATHER_CONDITIONS = (
    "clear",
    "partly_cloudy",
    "cloudy",
    "rainy",
    "heavy_rain",
    "snow",
    "fog",
    "windy",
)
