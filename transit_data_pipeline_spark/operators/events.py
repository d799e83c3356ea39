"""Event-stream operators, batch twins of the Structured Streaming
pipeline (SURVEY §2.9): tumbling-window rollups, discretized as-of
lookups, semi-structured extraction, gap sessionization.

The `events` table carries nanosecond timestamps; Spark reads them as
raw nanos LONG (`ts`) plus a derived microsecond `event_time`
(catalog.table). Durations are computed in integer nanoseconds so
results are exact. The streaming variants (readStream + watermark +
window + foreachBatch) live in transit_data_pipeline_spark/streaming/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import numeric as N
from .registry import register

#: DuckDB twin of catalog's microsecond event_time derivation.
SQL_EVENT_TIME = "make_timestamp(epoch_ns(ts) // 1000)"


@register(
    "hourly_event_rollup",
    ops=("A1", "A3", "F5", "S10"),
    doc="Tumbling 1-hour rollup per event type — the batch twin of the "
    "streaming windowed aggregate and of the reference's hourly "
    "aggregate fact (`fact_dim_tables.sql:138-150,372-380`).",
    oracle=f"""
SELECT
  strftime(date_trunc('hour', {SQL_EVENT_TIME}), '%Y-%m-%d %H:00') AS hour_bucket,
  event_type,
  COUNT(*) AS n_events,
  COUNT(DISTINCT user_id) AS n_users,
  {N.sql_dsum("value")} AS total_value,
  {N.sql_davg("value")} AS avg_value
FROM events
GROUP BY 1, 2
""",
)
def hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "event_time"), "yyyy-MM-dd HH:00").alias(
                "hour_bucket"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            N.dsum("value").alias("total_value"),
            N.davg("value").alias("avg_value"),
        )
    )


@register(
    "hourly_bucket_lookup",
    ops=("J7", "J6", "A3"),
    doc="As-of lookup discretized to the hour: each event joined to its "
    "hour-bucket aggregate (ref hourly weather lookup "
    "`ml_feature_engineering.sql:192-213`) — decorrelated groupBy+join, "
    "never a per-row subquery.",
    oracle=f"""
WITH hourly AS (
  SELECT date_trunc('hour', {SQL_EVENT_TIME}) AS hour_bucket,
         {N.sql_davg("value")} AS hour_avg_value
  FROM events GROUP BY 1
)
SELECT e.event_id, e.event_type, e.value, h.hour_avg_value,
       e.value - h.hour_avg_value AS deviation
FROM events e
JOIN hourly h ON date_trunc('hour', {SQL_EVENT_TIME}) = h.hour_bucket
""",
)
def hourly_bucket_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.date_trunc("hour", "event_time").alias("hour_bucket"))
        .agg(N.davg("value").alias("hour_avg_value"))
    )
    return (
        e.withColumn("hour_bucket", F.date_trunc("hour", "event_time"))
        .join(F.broadcast(hourly), "hour_bucket")
        .select(
            "event_id",
            "event_type",
            "value",
            "hour_avg_value",
            (F.col("value") - F.col("hour_avg_value")).alias("deviation"),
        )
    )


@register(
    "json_props_extract",
    ops=("P9", "A3", "F10"),
    doc="Semi-structured extraction from the JSON props column via "
    "regexp (portable to the oracle), then grouped stats — the engine's "
    "string-parse surface (ref GTFS time parse `create_schema.sql:199-221`).",
    oracle=f"""
WITH parsed AS (
  SELECT event_type,
         CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) AS k
  FROM events
)
SELECT event_type,
  COUNT(*) AS n_events,
  COUNT(k) AS n_with_k,
  {N.sql_davg("k")} AS avg_k,
  MIN(k) AS min_k,
  MAX(k) AS max_k
FROM parsed
GROUP BY 1
""",
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    parsed = e.select(
        "event_type",
        F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("int").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("k").alias("n_with_k"),
        N.davg("k").alias("avg_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


@register(
    "sessionization_gap30m",
    ops=("W3", "W4", "A3", "A11"),
    doc="Gap-based sessionization (30-min inactivity) via LAG + running "
    "SUM of session-start flags — the batch twin of stateful streaming "
    "sessionization; durations in exact integer nanoseconds.",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id, epoch_ns(ts) AS ts_ns,
    CASE WHEN epoch_ns(ts) - LAG(epoch_ns(ts)) OVER w > 1800000000000
         OR LAG(epoch_ns(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
), sessions AS (
  SELECT user_id, event_id, ts_ns,
    SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS INT) AS session_seq,
  COUNT(*) AS n_events,
  (MAX(ts_ns) - MIN(ts_ns)) // 1000000000 AS duration_sec
FROM sessions
GROUP BY 1, 2
""",
)
def sessionization_gap30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ns = F.col("ts") - F.lag("ts").over(w)
    flagged = e.select(
        "user_id",
        "event_id",
        F.col("ts").alias("ts_ns"),
        F.when(gap_ns > 1_800_000_000_000, 1)
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0)
        .alias("is_start"),
    )
    run_w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.withColumn(
        "session_seq", F.sum("is_start").over(run_w).cast("int")
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("(max(ts_ns) - min(ts_ns)) div 1000000000").alias("duration_sec"),
    )


@register(
    "asof_join_prior_purchase",
    ops=("J7", "W3"),
    doc="True as-of join (the continuous generalization of the "
    "reference's hourly-bucket weather lookup, "
    "`ml_feature_engineering.sql:192-213`): each click is matched to "
    "the user's most recent purchase at-or-before it. Spark has no "
    "ASOF JOIN operator; the scalable composition is union the two "
    "sides, one window per user ordered by time, and carry the last "
    "non-null purchase forward — one shuffle on user_id, no range "
    "join, no per-row subquery. Oracle uses DuckDB's native ASOF JOIN.",
    oracle="""
SELECT c.event_id, c.user_id, epoch_us(c.ts) AS click_ts_us,
       p.value AS last_purchase_value,
       epoch_us(p.ts) AS purchase_ts_us
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts >= p.ts
""",
)
def asof_join_prior_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    # Purchases sort before clicks at equal ts so "at-or-before"
    # includes same-instant purchases (ASOF >= semantics).
    order_flag = F.when(F.col("event_type") == "purchase", 0).otherwise(1)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", order_flag.alias("flag"), "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pval = F.when(F.col("event_type") == "purchase", F.col("value"))
    pts_us = F.when(F.col("event_type") == "purchase", F.expr("ts div 1000"))
    carried = e.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.last(pval, ignorenulls=True).over(w).alias("last_purchase_value"),
        F.last(pts_us, ignorenulls=True).over(w).alias("purchase_ts_us"),
    )
    return carried.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        F.expr("ts div 1000").alias("click_ts_us"),
        "last_purchase_value",
        "purchase_ts_us",
    )
