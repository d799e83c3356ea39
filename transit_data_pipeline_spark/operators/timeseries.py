"""Gap-aware time-series operators: value-range window frames, LOCF
gap filling over a generated spine, and gaps-and-islands streaks.

These complete the hypertable-style analytics family
(`rollup_multi_granularity`, `moving_avg_7day`): the ROWS-frame moving
averages elsewhere assume a dense daily series; the operators here are
the sparse-series duals — a RANGE frame keyed on the *value* of the
time axis (so a 7-day window spans 7 calendar days even when most days
have no rows), an explicit date-spine + last-observation-carried-forward
fill, and consecutive-day streak detection via the classic
row_number-offset island key (ref: the reference densifies sparse
per-route series before windowing, `sql/analysis_queries.sql:88-116`).

Scale notes: every window partitions by a key (priority, user), so no
global sort. The daily pre-aggregate shrinks the fact table ~1e4×
before any window runs — the windows operate on the aggregate, not the
fact. The LOCF spine is (n_keys × n_days), generated with
``sequence``+``explode`` executor-side (no driver loop) and joined to
the aggregate via a hash join on (key, day); at 100 TB the spine is
still tiny relative to facts. The streak island key is computed with
one partitioned sort per user — the same shuffle the sessionization
operator already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import numeric as N
from .events import SQL_EVENT_TIME
from .registry import register

#: Shared daily pre-aggregate (1996 slice of orders, per priority).
_DAILY_SQL = f"""
  SELECT o_orderpriority,
         CAST(o_orderdate AS DATE) AS d,
         COUNT(*) AS n_orders,
         {N.sql_dsum("o_totalprice")} AS day_revenue
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
  GROUP BY 1, 2
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(
            "o_orderpriority", F.to_date("o_orderdate").alias("d")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            N.dsum("o_totalprice").alias("day_revenue"),
        )
    )


@register(
    "time_range_window",
    ops=("W9", "A3", "F5"),
    doc="Gap-aware 7-calendar-day moving window: RANGE frame keyed on "
    "the epoch-day VALUE, so the frame spans 7 calendar days even "
    "where the per-priority daily series has holes (a ROWS frame "
    "would silently span weeks). days_present exposes how sparse "
    "each frame actually was.",
    oracle=f"""
WITH daily AS ({_DAILY_SQL}),
e AS (
  SELECT *, date_diff('day', DATE '1970-01-01', d) AS epoch_day FROM daily
)
SELECT o_orderpriority,
       strftime(d, '%Y-%m-%d') AS order_day,
       n_orders,
       day_revenue,
       CAST(SUM(CAST(day_revenue AS DECIMAL(18,4))) OVER w AS DOUBLE) AS rev_7d,
       COUNT(*) OVER w AS days_present
FROM e
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY epoch_day
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
)
def time_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir).withColumn(
        "epoch_day", F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("epoch_day")
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "o_orderpriority",
        F.date_format("d", "yyyy-MM-dd").alias("order_day"),
        "n_orders",
        "day_revenue",
        F.sum(F.col("day_revenue").cast(N.DEC)).over(w).cast("double").alias("rev_7d"),
        F.count(F.lit(1)).over(w).alias("days_present"),
    )


@register(
    "gap_fill_locf",
    ops=("F7", "J5", "W14"),
    doc="Time-series densification: generate a (priority × day) spine "
    "with sequence+explode, left-join the sparse daily aggregate, and "
    "fill holes with last-observation-carried-forward via "
    "last(ignorenulls) over an unbounded-preceding frame — the "
    "standard gap-fill the reference does by materializing a dense "
    "calendar table (`fact_dim_tables.sql:44-71`).",
    oracle=f"""
WITH daily AS ({_DAILY_SQL}),
spine AS (
  SELECT p.o_orderpriority, CAST(g.d AS DATE) AS d
  FROM (SELECT DISTINCT o_orderpriority FROM orders) p
  CROSS JOIN (
    SELECT unnest(generate_series(DATE '1996-01-01', DATE '1996-12-31',
                                  INTERVAL 1 DAY)) AS d
  ) g
)
SELECT s.o_orderpriority,
       strftime(s.d, '%Y-%m-%d') AS order_day,
       (daily.d IS NOT NULL) AS is_observed,
       COALESCE(
         last_value(daily.day_revenue IGNORE NULLS) OVER (
           PARTITION BY s.o_orderpriority ORDER BY s.d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         0.0) AS filled_revenue
FROM spine s
LEFT JOIN daily ON daily.o_orderpriority = s.o_orderpriority AND daily.d = s.d
""",
)
def gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    daily = _daily(spark, sf_dir)
    spine = (
        o.select("o_orderpriority")
        .distinct()
        .crossJoin(
            spark.range(1).select(
                F.explode(
                    F.sequence(
                        F.lit("1996-01-01").cast("date"),
                        F.lit("1996-12-31").cast("date"),
                        F.expr("interval 1 day"),
                    )
                ).alias("d")
            )
        )
    )
    joined = spine.alias("s").join(
        daily.alias("o"),
        on=[
            F.col("s.o_orderpriority") == F.col("o.o_orderpriority"),
            F.col("s.d") == F.col("o.d"),
        ],
        how="left",
    )
    w = (
        Window.partitionBy(F.col("s.o_orderpriority"))
        .orderBy(F.col("s.d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col("s.o_orderpriority").alias("o_orderpriority"),
        F.date_format(F.col("s.d"), "yyyy-MM-dd").alias("order_day"),
        F.col("o.d").isNotNull().alias("is_observed"),
        F.coalesce(
            F.last(F.col("o.day_revenue"), ignorenulls=True).over(w),
            F.lit(0.0),
        ).alias("filled_revenue"),
    )


@register(
    "streaks_active_days",
    ops=("W4", "A3", "F5"),
    doc="Gaps-and-islands: per-user consecutive-active-day streaks via "
    "the epoch_day − row_number island key, rolled up to per-user "
    "streak stats — the engagement-streak pattern the reference "
    "computes for consecutive delayed days per route "
    "(`sql/analysis_queries.sql:252-271`).",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS d
  FROM events
),
isl AS (
  SELECT user_id, d,
         date_diff('day', DATE '1970-01-01', d)
           - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS island
  FROM days
),
streaks AS (
  SELECT user_id, island, COUNT(*) AS streak_len
  FROM isl GROUP BY user_id, island
)
SELECT user_id,
       CAST(SUM(streak_len) AS BIGINT) AS n_active_days,
       COUNT(*) AS n_streaks,
       MAX(streak_len) AS max_streak_days
FROM streaks
GROUP BY user_id
""",
)
def streaks_active_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("event_time").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.select(
        "user_id",
        "d",
        (
            F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("island"),
    )
    streaks = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return streaks.groupBy("user_id").agg(
        F.sum("streak_len").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("streak_len").alias("max_streak_days"),
    )


@register(
    "seasonal_decompose_dow",
    ops=("W9", "A3", "A9", "F1"),
    doc="Classical seasonal decomposition, day-of-week component: "
    "daily revenue detrended by a CENTERED 7-day moving average "
    "(full windows only — edges yield NULL trend and drop out), "
    "ratio-to-trend per day, seasonal index = decimal-exact mean "
    "ratio per weekday. The daily pre-aggregate bounds the window at "
    "days, not orders; one shuffle for the aggregate, one "
    "unpartitioned-but-days-sized window.",
    oracle=f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    {N.sql_dsum("o_totalprice")} AS rev
  FROM orders GROUP BY 1
),
trended AS (
  SELECT d, rev,
    CASE WHEN COUNT(*) OVER w = 7
         THEN CAST(SUM(CAST(rev AS DECIMAL(18,4))) OVER w AS DOUBLE) / 7
    END AS trend,
    dayofweek(d) + 1 AS dow  -- DuckDB 0=Sun .. 6; Spark 1=Sun .. 7
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
)
SELECT CAST(dow AS INTEGER) AS dow,
  CAST(COUNT(rev / trend) AS BIGINT) AS n_days,
  CAST(SUM(CAST(rev / trend AS DECIMAL(18,10))) AS DOUBLE)
    / COUNT(rev / trend) AS seasonal_index,
  MIN(rev / trend) AS min_ratio,
  MAX(rev / trend) AS max_ratio
FROM trended
WHERE trend IS NOT NULL
GROUP BY dow
""",
)
def seasonal_decompose_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        N.dsum("o_totalprice").alias("rev")
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    trend = F.when(
        F.count(F.lit(1)).over(w) == 7,
        F.sum(F.col("rev").cast(N.DEC)).over(w).cast("double") / 7,
    )
    trended = daily.select(
        F.dayofweek("d").alias("dow"),
        "rev",
        trend.alias("trend"),
    ).filter(F.col("trend").isNotNull())
    ratio = F.col("rev") / F.col("trend")
    return trended.groupBy(F.col("dow").cast("int").alias("dow")).agg(
        F.count(ratio).cast("bigint").alias("n_days"),
        (
            F.sum(ratio.cast("decimal(18,10)")).cast("double") / F.count(ratio)
        ).alias("seasonal_index"),
        F.min(ratio).alias("min_ratio"),
        F.max(ratio).alias("max_ratio"),
    )


# --- interval analytics over the event stream -----------------------
#
# The three operators below extend the gap-aware family from daily
# spines to raw event intervals: union-of-intervals coverage (the
# classic "merge overlapping sessions" sweep), OHLC bar resampling
# (the hypertable `time_bucket` + first/last pattern), and
# time-weighted averaging for irregularly-sampled series (the standard
# IoT/finance aggregate that a plain AVG gets wrong when sampling is
# bursty). All three are window + hash-agg compositions partitioned by
# a key (user_id / event_type / event_type×day) — per-key sorts, no
# global sort, no UDFs; exact integer-second arithmetic end to end.

#: Each event opens a 15-minute presence interval.
INTERVAL_SECONDS = 900

#: Epoch-seconds spelling on the raw nanosecond `ts` column.
_SQL_EPOCH_S = "(epoch_ns(ts) // 1000000000)"


@register(
    "interval_coverage",
    ops=("W4", "W14", "A3"),
    doc="Union-of-intervals coverage: each event opens a 15-min "
    "presence interval per user; overlapping intervals are merged by "
    "the running-max sweep (MAX(end) OVER preceding rows starts a new "
    "island when the next start clears it) and rolled up to per-user "
    "covered seconds — the interval-merge dual of sessionization "
    "(ref consecutive-delay islands, `sql/analysis_queries.sql:252-271`). "
    "One per-user sort; exact integer seconds.",
    oracle=f"""
WITH iv AS (
  SELECT user_id, event_id, {_SQL_EPOCH_S} AS s,
         {_SQL_EPOCH_S} + {INTERVAL_SECONDS} AS e
  FROM events
),
m AS (
  SELECT *, MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            AS prev_max_e
  FROM iv
),
isl AS (
  SELECT *, SUM(CASE WHEN prev_max_e IS NULL OR s > prev_max_e THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM m
),
g AS (
  SELECT user_id, island, MIN(s) AS i_start, MAX(e) AS i_end,
         COUNT(*) AS n_ev
  FROM isl GROUP BY 1, 2
)
SELECT user_id,
       CAST(SUM(n_ev) AS BIGINT) AS n_events,
       COUNT(*) AS n_intervals,
       CAST(SUM(i_end - i_start) AS BIGINT) AS covered_seconds,
       CAST(MAX(i_end - i_start) AS BIGINT) AS max_interval_seconds
FROM g
GROUP BY user_id
""",
)
def interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        "event_id",
        F.expr("ts div 1000000000").alias("s"),
    ).withColumn("e", F.col("s") + F.lit(INTERVAL_SECONDS))
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = iv.withColumn("prev_max_e", F.max("e").over(w_prev))
    isl = m.withColumn(
        "island",
        F.sum(
            F.when(
                F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e")),
                1,
            ).otherwise(0)
        ).over(w_run),
    )
    g = isl.groupBy("user_id", "island").agg(
        F.min("s").alias("i_start"),
        F.max("e").alias("i_end"),
        F.count(F.lit(1)).alias("n_ev"),
    )
    return g.groupBy("user_id").agg(
        F.sum("n_ev").cast("long").alias("n_events"),
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.col("i_end") - F.col("i_start")).cast("long").alias("covered_seconds"),
        F.max(F.col("i_end") - F.col("i_start")).cast("long").alias("max_interval_seconds"),
    )


@register(
    "ohlc_bars",
    ops=("W13", "A3", "F5"),
    doc="OHLC bar resampling: per event-type per day, open/close from "
    "first/last value in (ts, event_id) order over the full-frame "
    "window, high/low/count/decimal-exact mean from the same frame — "
    "the hypertable time_bucket + first()/last() rollup the reference "
    "approximates with correlated min-timestamp lookups. One "
    "partitioned sort per (type, day); no self-join, no UDF.",
    oracle=f"""
SELECT DISTINCT event_type,
  strftime(CAST({SQL_EVENT_TIME} AS DATE), '%Y-%m-%d') AS bar_day,
  first_value(value) OVER w AS open,
  MAX(value) OVER w AS high,
  MIN(value) OVER w AS low,
  last_value(value) OVER w AS close,
  COUNT(*) OVER w AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
    / COUNT(*) OVER w AS bar_avg
FROM events
WINDOW w AS (PARTITION BY event_type, CAST({SQL_EVENT_TIME} AS DATE)
             ORDER BY {_SQL_EPOCH_S}, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").withColumn(
        "bar_date", F.to_date("event_time")
    )
    w = (
        Window.partitionBy("event_type", "bar_date")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "event_type",
        F.date_format("bar_date", "yyyy-MM-dd").alias("bar_day"),
        F.first("value").over(w).alias("open"),
        F.max("value").over(w).alias("high"),
        F.min("value").over(w).alias("low"),
        F.last("value").over(w).alias("close"),
        F.count(F.lit(1)).over(w).alias("n_events"),
        (
            F.sum(F.col("value").cast(N.DEC)).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("bar_avg"),
    ).distinct()


@register(
    "time_weighted_avg",
    ops=("W14", "A9", "A3"),
    doc="Time-weighted average for irregularly-sampled series: each "
    "value weighted by its holding duration (LEAD(ts) − ts seconds, "
    "last observation per type carries no weight), TWA = Σ(value·dt) "
    "/ Σ(dt) with the product summed in exact decimal — the IoT/"
    "finance aggregate a plain AVG mis-states under bursty sampling. "
    "Reported beside the unweighted mean so the sampling bias is "
    "visible. One per-type sort, one hash agg.",
    oracle=f"""
WITH seq AS (
  SELECT event_type, value, {_SQL_EPOCH_S} AS s,
         LEAD({_SQL_EPOCH_S}) OVER (PARTITION BY event_type
                                    ORDER BY {_SQL_EPOCH_S}, event_id) AS s_next
  FROM events
),
d AS (SELECT event_type, value, s, s_next - s AS dt FROM seq)
SELECT event_type,
  COUNT(*) AS n_events,
  CAST(MAX(s) - MIN(s) AS BIGINT) AS span_seconds,
  CAST(SUM(CAST(value * dt AS DECIMAL(18,4))) AS DOUBLE)
    / CAST(SUM(dt) AS DOUBLE) AS time_weighted_avg,
  {N.sql_davg("value")} AS simple_avg
FROM d
GROUP BY event_type
""",
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").withColumn(
        "s", F.expr("ts div 1000000000")
    )
    w = Window.partitionBy("event_type").orderBy("s", "event_id")
    d = e.withColumn("dt", F.lead("s").over(w) - F.col("s"))
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("s") - F.min("s")).cast("long").alias("span_seconds"),
        (
            F.sum((F.col("value") * F.col("dt")).cast(N.DEC)).cast("double")
            / F.sum("dt").cast("double")
        ).alias("time_weighted_avg"),
        N.davg("value").alias("simple_avg"),
    )


@register(
    "rolling_regression_slope",
    ops=("W9", "A3", "A9"),
    doc="Rolling 28-day OLS trend slope of daily revenue per order "
    "priority: slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) with x = epoch "
    "day and y = daily revenue, every Σ an exact-decimal window sum "
    "over a 28-row ROWS frame, so the one double division per row is "
    "bitwise deterministic. The windowed linear-trend detector the "
    "reference fakes with week-over-week LAG deltas "
    "(`sql/analysis_queries.sql:88-116`); slope units are revenue per "
    "day. Daily pre-aggregate bounds the window at days; one "
    "priority-keyed sort.",
    oracle=f"""
WITH daily AS ({_DAILY_SQL}),
e AS (
  SELECT o_orderpriority, d, day_revenue,
         date_diff('day', DATE '1970-01-01', d) AS x
  FROM daily
),
s AS (
  SELECT o_orderpriority, d, day_revenue,
    COUNT(*) OVER w AS n,
    CAST(SUM(CAST(x AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sx,
    CAST(CAST(SUM(CAST(x AS DECIMAL(19,4)) * CAST(x AS DECIMAL(18,4))) OVER w
         AS VARCHAR) AS DOUBLE) AS sxx,
    CAST(SUM(CAST(day_revenue AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sy,
    CAST(CAST(SUM(CAST(x AS DECIMAL(19,4)) * CAST(day_revenue AS DECIMAL(18,4))) OVER w
         AS VARCHAR) AS DOUBLE) AS sxy
  FROM e
  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY x
               ROWS BETWEEN 27 PRECEDING AND CURRENT ROW)
)
SELECT o_orderpriority,
  strftime(d, '%Y-%m-%d') AS order_day,
  n AS window_days,
  CASE WHEN n >= 14 AND (n * sxx - sx * sx) <> 0
       THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
  END AS slope_per_day
FROM s
""",
)
def rolling_regression_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir).withColumn(
        "x", F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("x")
        .rowsBetween(-27, 0)
    )
    xd = F.col("x").cast(N.DEC)
    yd = F.col("day_revenue").cast(N.DEC)
    n = F.count(F.lit(1)).over(w)
    sx = F.sum(xd).over(w).cast("double")
    sxx = F.sum(xd * xd).over(w).cast("double")
    sy = F.sum(yd).over(w).cast("double")
    sxy = F.sum(xd * yd).over(w).cast("double")
    denom = n * sxx - sx * sx
    slope = F.when(
        (n >= 14) & (denom != 0), (n * sxy - sx * sy) / denom
    )
    return daily.select(
        "o_orderpriority",
        F.date_format("d", "yyyy-MM-dd").alias("order_day"),
        n.alias("window_days"),
        slope.alias("slope_per_day"),
    )


#: Lead/lag offsets scanned by the cross-correlation operator.
XCORR_LAGS = (-3, -2, -1, 0, 1, 2, 3)


@register(
    "cross_corr_lagged",
    ops=("W2", "A3", "J10"),
    doc="Lead-lag cross-correlation between the daily click and "
    "purchase value series: for each lag in ±3 days, Pearson r of "
    "(clicks on day d, purchases on day d+lag) using the "
    "deterministic decimal-exact correlation (functions/numeric "
    "dcorr) — the does-traffic-lead-revenue probe. Two daily "
    "pre-aggregates bound everything at days; the 7-lag grid is a "
    "broadcast cross join against the day-keyed series, one hash "
    "agg per lag. No window over the fact table at all.",
    oracle=f"""
WITH daily AS (
  SELECT CAST({SQL_EVENT_TIME} AS DATE) AS d, event_type,
         {N.sql_dsum("value")} AS v
  FROM events
  WHERE event_type IN ('click', 'purchase')
  GROUP BY 1, 2
),
c AS (SELECT d, v FROM daily WHERE event_type = 'click'),
p AS (SELECT d, v FROM daily WHERE event_type = 'purchase'),
lags AS (SELECT UNNEST([{', '.join(str(l) for l in XCORR_LAGS)}]) AS lag),
joined AS (
  SELECT g.lag, c.v AS x, p.v AS y
  FROM lags g
  JOIN c ON TRUE
  JOIN p ON p.d = c.d + CAST(g.lag AS INTEGER)
)
SELECT lag, COUNT(*) AS n_days, {N.sql_dcorr("x", "y")} AS xcorr
FROM joined
GROUP BY lag
""",
)
def cross_corr_lagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            F.to_date("event_time").alias("d"),
            "event_type",
        )
        .agg(N.dsum("value").alias("v"))
    )
    c = daily.filter(F.col("event_type") == "click").select(
        F.col("d").alias("cd"), F.col("v").alias("x")
    )
    p = daily.filter(F.col("event_type") == "purchase").select(
        F.col("d").alias("pd"), F.col("v").alias("y")
    )
    lags = spark.createDataFrame([(l,) for l in XCORR_LAGS], "lag int")
    joined = (
        c.crossJoin(F.broadcast(lags))
        .join(p, F.expr("pd = date_add(cd, lag)"))
    )
    return joined.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_days"),
        N.dcorr("x", "y").alias("xcorr"),
    )


#: EWMA truncation horizon: weights 2^-(i) for i in 0..EWMA_K. With
#: α = 1/2 the weights are exact powers of two, so the whole smoother
#: is INTEGER arithmetic (numerator Σ x·2^(K−i), denominator Σ 2^(K−i))
#: followed by one correctly-rounded double division — bitwise equal on
#: any engine and any partition layout. 2^-20 < 1e-6 ≈ full precision.
EWMA_K = 20


@register(
    "ewma_smoothing",
    ops=("W9", "J7", "A3", "F5"),
    doc="Exponentially-weighted moving average (α=1/2, horizon 20 "
    "rows) over the per-priority daily order-count series — the "
    "standard ingest-rate smoother behind drift dashboards. The "
    "variable per-lag weight rules out a plain window frame, so the "
    "frame is materialized as a bounded self-join on the row index "
    "(≤ K+1 rows per output row, equi-keyed on priority); weights "
    "2^(K−lag) keep numerator and denominator in exact BIGINT, and "
    "the single final division is IEEE-deterministic. The series is "
    "a daily pre-aggregate, so the join input is ~1e4× smaller than "
    "the fact table regardless of corpus scale.",
    oracle=f"""
WITH daily AS ({_DAILY_SQL}),
idx AS (
  SELECT o_orderpriority, d, n_orders,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY d) AS r
  FROM daily
)
SELECT a.o_orderpriority,
       strftime(a.d, '%Y-%m-%d') AS order_day,
       a.n_orders,
       ROUND(CAST(SUM(b.n_orders * (CAST(1 AS BIGINT) << ({EWMA_K} - (a.r - b.r)))) AS DOUBLE)
             / CAST(SUM(CAST(1 AS BIGINT) << ({EWMA_K} - (a.r - b.r))) AS DOUBLE), 4)
         AS ewma
FROM idx a JOIN idx b
  ON a.o_orderpriority = b.o_orderpriority
 AND b.r BETWEEN a.r - {EWMA_K} AND a.r
GROUP BY a.o_orderpriority, a.d, a.n_orders
""",
)
def ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy("d")
    idx = daily.select(
        "o_orderpriority", "d", "n_orders", F.row_number().over(w).alias("r")
    )
    a = idx.alias("a")
    b = idx.select(
        F.col("o_orderpriority").alias("bp"),
        F.col("n_orders").alias("bn"),
        F.col("r").alias("br"),
    ).alias("b")
    weight = F.expr(
        f"shiftleft(cast(1 as bigint), cast({EWMA_K} - (a.r - br) as int))"
    )
    joined = a.join(
        b,
        (F.col("a.o_orderpriority") == F.col("bp"))
        & (F.col("br") >= F.col("a.r") - EWMA_K)
        & (F.col("br") <= F.col("a.r")),
    )
    return (
        joined.groupBy("a.o_orderpriority", "a.d", "a.n_orders")
        .agg(
            F.round(
                F.sum(F.col("bn") * weight).cast("double")
                / F.sum(weight).cast("double"),
                4,
            ).alias("ewma")
        )
        .select(
            "o_orderpriority",
            F.date_format("d", "yyyy-MM-dd").alias("order_day"),
            "n_orders",
            "ewma",
        )
    )


@register(
    "cusum_changepoint",
    ops=("W11", "A3", "A4", "O1"),
    doc="CUSUM change-point detection per priority: the cumulative sum "
    "of deviations from the series mean, S_t = Σ x_s − t·mean, peaks "
    "at the most likely mean-shift point — the classic ingest-drift "
    "detector for a training-data pipeline's intake monitors. "
    "Determinism: the prefix sum is exact BIGINT (counts), the mean "
    "is one exact-int division, and S_t = cum − t·mean is two IEEE "
    "ops per row, so both engines agree bitwise; the peak row is "
    "picked by (|S| DESC, day ASC) row_number. One partitioned sort "
    "over the daily aggregate — no full-fact shuffle at any scale.",
    oracle=f"""
WITH daily AS ({_DAILY_SQL}),
idx AS (
  SELECT o_orderpriority, d, n_orders,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY d) AS r,
         SUM(n_orders) OVER (PARTITION BY o_orderpriority ORDER BY d) AS cum
  FROM daily
),
tot AS (
  SELECT o_orderpriority, COUNT(*) AS n_days, SUM(n_orders) AS total,
         {N.sql_dstddev("n_orders")} AS sd
  FROM daily GROUP BY 1
),
s AS (
  SELECT i.o_orderpriority, i.d, i.r, t.n_days, t.sd,
         i.cum - i.r * (CAST(t.total AS DOUBLE) / t.n_days) AS s_t
  FROM idx i JOIN tot t USING (o_orderpriority)
),
peak AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY o_orderpriority ORDER BY ABS(s_t) DESC, d
  ) AS pk FROM s
)
SELECT o_orderpriority,
       strftime(d, '%Y-%m-%d') AS changepoint_day,
       n_days,
       ROUND(s_t, 4) AS cusum_peak,
       ROUND(ABS(s_t) / (sd * SQRT(n_days)), 4) AS norm_stat
FROM peak WHERE pk = 1
""",
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    wo = Window.partitionBy("o_orderpriority").orderBy("d")
    idx = daily.select(
        "o_orderpriority",
        "d",
        "n_orders",
        F.row_number().over(wo).alias("r"),
        F.sum("n_orders").over(wo).alias("cum"),
    )
    tot = daily.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n_orders").alias("total"),
        N.dstddev("n_orders").alias("sd"),
    )
    s = idx.join(F.broadcast(tot), "o_orderpriority").withColumn(
        "s_t",
        F.col("cum")
        - F.col("r") * (F.col("total").cast("double") / F.col("n_days")),
    )
    wp = Window.partitionBy("o_orderpriority").orderBy(
        F.abs(F.col("s_t")).desc(), "d"
    )
    return (
        s.withColumn("pk", F.row_number().over(wp))
        .filter(F.col("pk") == 1)
        .select(
            "o_orderpriority",
            F.date_format("d", "yyyy-MM-dd").alias("changepoint_day"),
            "n_days",
            F.round("s_t", 4).alias("cusum_peak"),
            F.round(
                F.abs(F.col("s_t")) / (F.col("sd") * F.sqrt(F.col("n_days"))),
                4,
            ).alias("norm_stat"),
        )
    )


@register(
    "theilsen_trend",
    ops=("J10", "W4", "A8", "A1"),
    doc="Theil–Sen robust trend per priority: the MEDIAN of all "
    "pairwise slopes (y_j−y_i)/(x_j−x_i) over the daily order-count "
    "series — outlier days move an OLS slope (rolling_regression_"
    "slope) but not this estimator (breakdown point 29%). The pair "
    "grid is bounded by days², never corpus size, because it runs "
    "on the daily pre-aggregate; each slope is one IEEE division of "
    "exact integers, and the median is picked positionally "
    "(row_number at floor((n+1)/2) over the slope sort) — no engine "
    "percentile builtin, so both sides select the identical element.",
    oracle=f"""
WITH daily AS ({_DAILY_SQL}),
idx AS (
  SELECT o_orderpriority, n_orders,
         date_diff('day', DATE '1970-01-01', d) AS x
  FROM daily
),
slopes AS (
  SELECT a.o_orderpriority,
         CAST(b.n_orders - a.n_orders AS DOUBLE) / (b.x - a.x) AS slope
  FROM idx a JOIN idx b
    ON a.o_orderpriority = b.o_orderpriority AND b.x > a.x
),
ranked AS (
  SELECT o_orderpriority, slope,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY slope) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n_pairs
  FROM slopes
)
SELECT o_orderpriority, n_pairs,
       ROUND(slope, 6) AS median_slope,
       (slope > 0) AS rising
FROM ranked WHERE rn = (n_pairs + 1) // 2
""",
)
def theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    idx = daily.select(
        "o_orderpriority",
        "n_orders",
        F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")).alias("x"),
    )
    a = idx.alias("a")
    b = idx.select(
        F.col("o_orderpriority").alias("bp"),
        F.col("n_orders").alias("bn"),
        F.col("x").alias("bx"),
    )
    slopes = a.join(
        b,
        (F.col("a.o_orderpriority") == F.col("bp"))
        & (F.col("bx") > F.col("a.x")),
    ).select(
        "o_orderpriority",
        (
            (F.col("bn") - F.col("a.n_orders")).cast("double")
            / (F.col("bx") - F.col("a.x"))
        ).alias("slope"),
    )
    wr = Window.partitionBy("o_orderpriority").orderBy("slope")
    wp = Window.partitionBy("o_orderpriority")
    ranked = slopes.select(
        "o_orderpriority",
        "slope",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n_pairs"),
    )
    return ranked.filter(
        F.col("rn") == F.floor((F.col("n_pairs") + 1) / 2)
    ).select(
        "o_orderpriority",
        "n_pairs",
        F.round("slope", 6).alias("median_slope"),
        (F.col("slope") > 0).alias("rising"),
    )


#: Users whose last activity is within this many days of the corpus
#: end are right-censored (still alive), not churned.
KM_CENSOR_DAYS = 3


@register(
    "survival_km_retention",
    ops=("A5", "W11", "F5", "A9"),
    doc="Kaplan–Meier retention over user lifetimes: lifetime = days "
    "between a user's first and last event day, churn observed only "
    "when the last activity predates the corpus end by more than "
    f"{KM_CENSOR_DAYS} days (otherwise right-censored). At each "
    "distinct lifetime t the hazard is d_t/n_t (churns over "
    "at-risk), and the survival curve is reported in LOG form — "
    "cumulative Σ ln(1−d/n) with each ln rounded to 6 dp and summed "
    "through DECIMAL — so the whole curve is cross-engine exact "
    "without a final transcendental. The per-user reduce is one "
    "hash agg over events; the curve itself lives on a frame "
    "bounded by distinct lifetimes (≤ observation window in days), "
    "so the ordered scan never touches corpus-sized data.",
    oracle=f"""
WITH ue AS (
  SELECT user_id,
         CAST(MIN({SQL_EVENT_TIME}) AS DATE) AS first_d,
         CAST(MAX({SQL_EVENT_TIME}) AS DATE) AS last_d
  FROM events GROUP BY user_id
),
horizon AS (SELECT MAX(last_d) AS end_d FROM ue),
life AS (
  SELECT user_id,
         date_diff('day', first_d, last_d) AS lifetime,
         (date_diff('day', last_d, h.end_d) > {KM_CENSOR_DAYS}) AS churned
  FROM ue, horizon h
),
risk AS (
  SELECT lifetime AS t,
         SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS d_t,
         COUNT(*) AS ended_t
  FROM life GROUP BY lifetime
),
curve AS (
  SELECT t, d_t,
         SUM(ended_t) OVER (ORDER BY t DESC) AS n_t
  FROM risk
)
SELECT t, CAST(d_t AS BIGINT) AS d_t, CAST(n_t AS BIGINT) AS n_t,
       CAST(SUM(CAST(
         CASE WHEN d_t = 0 THEN 0.0
              ELSE ROUND(LN(1.0 - CAST(d_t AS DOUBLE) / n_t), 6) END
         AS DECIMAL(18,6))) OVER (ORDER BY t) AS DOUBLE) AS log_survival
FROM curve
ORDER BY t
""",
)
def survival_km_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    ue = e.groupBy("user_id").agg(
        F.min(F.to_date("event_time")).alias("first_d"),
        F.max(F.to_date("event_time")).alias("last_d"),
    )
    horizon = ue.agg(F.max("last_d").alias("end_d"))
    life = ue.crossJoin(F.broadcast(horizon)).select(
        F.datediff("last_d", "first_d").alias("lifetime"),
        (F.datediff("end_d", "last_d") > KM_CENSOR_DAYS).alias("churned"),
    )
    risk = life.groupBy(F.col("lifetime").alias("t")).agg(
        F.sum(F.when(F.col("churned"), 1).otherwise(0)).alias("d_t"),
        F.count(F.lit(1)).alias("ended_t"),
    )
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = risk.select(
        "t", "d_t", F.sum("ended_t").over(w_desc).alias("n_t")
    )
    lnterm = F.when(F.col("d_t") == 0, F.lit(0.0)).otherwise(
        F.round(F.log(1.0 - F.col("d_t").cast("double") / F.col("n_t")), 6)
    )
    w_asc = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return curve.select(
        "t",
        "d_t",
        "n_t",
        F.sum(lnterm.cast("decimal(18,6)"))
        .over(w_asc)
        .cast("double")
        .alias("log_survival"),
    ).orderBy("t")


#: Maximum autocorrelation lag (days) scanned by acf_daily_orders.
ACF_MAX_LAG = 14


@register(
    "acf_daily_orders",
    ops=("A1", "A9", "F5", "J4", "W4"),
    doc="Sample autocorrelation function of the daily order-count "
    "series at lags 1..14 (weekly seasonality shows up as a spike "
    "at lag 7) — the classic pre-forecasting diagnostic (Box & "
    "Jenkins). All arithmetic is EXACT int64: with S = Σy and n "
    "days, r_k = Σ(n·y_t − S)(n·y_{t−k} − S) / Σ(n·y_t − S)² — "
    "the mean-centering is cleared of division by multiplying "
    "through by n², so numerator and denominator are exact integer "
    "sums and the only float op is one correctly-rounded division "
    "per lag (bitwise identical on any engine / partition layout). "
    "Lag pairing is a self-join on the row_number of the ~365-row "
    "daily aggregate — the fact table is touched once; everything "
    "after runs on the daily frame. The white-noise band is "
    "±1.96/√n (IEEE sqrt, correctly rounded).",
    oracle=f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS y
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
  GROUP BY 1
),
s AS (SELECT COUNT(*) AS n, SUM(y) AS sy FROM daily),
z AS (
  SELECT ROW_NUMBER() OVER (ORDER BY d) AS rn,
         CAST(s.n * daily.y - s.sy AS BIGINT) AS z
  FROM daily, s
),
den AS (SELECT SUM(z * z) AS den FROM z),
pairs AS (
  SELECT a.rn - b.rn AS lag, a.z * b.z AS zz
  FROM z a JOIN z b
    ON a.rn - b.rn BETWEEN 1 AND {ACF_MAX_LAG}
)
SELECT p.lag,
  CAST(COUNT(*) AS BIGINT) AS n_pairs,
  CAST(SUM(p.zz) AS DOUBLE) / CAST(d.den AS DOUBLE) AS acf,
  1.96 / sqrt(CAST(s.n AS DOUBLE)) AS noise_band,
  abs(CAST(SUM(p.zz) AS DOUBLE) / CAST(d.den AS DOUBLE))
    > 1.96 / sqrt(CAST(s.n AS DOUBLE)) AS significant
FROM pairs p, den d, s
GROUP BY p.lag, d.den, s.n
""",
)
def acf_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    daily = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).alias("y"))
    )
    stats = daily.agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("sy")
    )
    # The window runs on the ~365-row daily aggregate (single
    # partition by construction — documented, not a fact-table sort).
    z = (
        daily.crossJoin(F.broadcast(stats))
        .select(
            F.row_number().over(Window.orderBy("d")).alias("rn"),
            (F.col("n") * F.col("y") - F.col("sy")).cast("bigint").alias("z"),
            "n",
        )
    )
    den = z.agg(F.sum(F.col("z") * F.col("z")).alias("den"))
    a, b = z.alias("a"), z.alias("b")
    pairs = a.join(
        F.broadcast(b),
        (F.col("a.rn") - F.col("b.rn") >= 1)
        & (F.col("a.rn") - F.col("b.rn") <= ACF_MAX_LAG),
    ).select(
        (F.col("a.rn") - F.col("b.rn")).alias("lag"),
        (F.col("a.z") * F.col("b.z")).alias("zz"),
        F.col("a.n").alias("n"),
    )
    acf = F.sum("zz").cast("double") / F.col("den").cast("double")
    band = F.lit(1.96) / F.sqrt(F.col("n").cast("double"))
    return (
        pairs.crossJoin(F.broadcast(den))
        .groupBy("lag", "den", "n")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("zz").alias("szz"),
        )
        .select(
            "lag",
            "n_pairs",
            (F.col("szz").cast("double") / F.col("den").cast("double")).alias(
                "acf"
            ),
            band.alias("noise_band"),
            (
                F.abs(F.col("szz").cast("double") / F.col("den").cast("double"))
                > band
            ).alias("significant"),
        )
    )


@register(
    "gap_fill_linear_interp",
    ops=("F7", "W9", "J5", "A9"),
    doc="Calendar gap fill by LINEAR INTERPOLATION between the "
    "bracketing observed days (the sensor-series upgrade of "
    "gap_fill_locf, which carries the last value flat): per "
    "priority the full calendar is generated, missing days find "
    "their previous/next observed (day, count) via IGNORE NULLS "
    "window frames, and the fill is the single exact division "
    "(y_prev·gap + Δy·offset)/gap — numerator and denominator are "
    "exact int64, so the interpolated double is bitwise identical "
    "on any engine/layout. Edges can't dangle (the calendar spans "
    "observed min..max). One fact aggregate; everything after runs "
    "on the ~365-row-per-priority calendar frame.",
    oracle=f"""
WITH daily AS ({_DAILY_SQL}),
b AS (
  SELECT o_orderpriority, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY 1
),
cal AS (
  SELECT b.o_orderpriority, CAST(u.g AS DATE) AS day
  FROM b, UNNEST(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) u(g)
),
j AS (
  SELECT c.o_orderpriority, c.day, dl.n_orders AS y
  FROM cal c LEFT JOIN daily dl
    ON c.o_orderpriority = dl.o_orderpriority AND c.day = dl.d
),
br AS (
  SELECT *,
    last_value(y IGNORE NULLS) OVER
      (PARTITION BY o_orderpriority ORDER BY day
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS y_prev,
    last_value(CASE WHEN y IS NOT NULL THEN day END IGNORE NULLS) OVER
      (PARTITION BY o_orderpriority ORDER BY day
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS d_prev,
    first_value(y IGNORE NULLS) OVER
      (PARTITION BY o_orderpriority ORDER BY day
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS y_next,
    first_value(CASE WHEN y IS NOT NULL THEN day END IGNORE NULLS) OVER
      (PARTITION BY o_orderpriority ORDER BY day
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS d_next
  FROM j
)
SELECT o_orderpriority,
  strftime(day, '%Y-%m-%d') AS order_day,
  y IS NULL AS is_gap,
  CASE WHEN y IS NOT NULL THEN CAST(y AS DOUBLE)
       ELSE CAST(y_prev * date_diff('day', d_prev, d_next)
                 + (y_next - y_prev) * date_diff('day', d_prev, day)
                 AS DOUBLE)
            / date_diff('day', d_prev, d_next)
  END AS y_filled
FROM br
""",
)
def gap_fill_linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir).select(
        "o_orderpriority", "d", F.col("n_orders").alias("y")
    )
    b = daily.groupBy("o_orderpriority").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    cal = b.select(
        "o_orderpriority",
        F.explode(F.sequence("d0", "d1")).alias("day"),
    )
    j = cal.join(
        daily,
        (cal["o_orderpriority"] == daily["o_orderpriority"])
        & (cal["day"] == daily["d"]),
        "left",
    ).select(cal["o_orderpriority"], "day", "y")
    wp = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("y").isNotNull(), F.col("day"))
    br = j.select(
        "o_orderpriority",
        "day",
        "y",
        F.last("y", ignorenulls=True).over(wp).alias("y_prev"),
        F.last(obs_day, ignorenulls=True).over(wp).alias("d_prev"),
        F.first("y", ignorenulls=True).over(wn).alias("y_next"),
        F.first(obs_day, ignorenulls=True).over(wn).alias("d_next"),
    )
    gap = F.datediff("d_next", "d_prev")
    off = F.datediff("day", "d_prev")
    return br.select(
        "o_orderpriority",
        F.date_format("day", "yyyy-MM-dd").alias("order_day"),
        F.col("y").isNull().alias("is_gap"),
        F.when(F.col("y").isNotNull(), F.col("y").cast("double"))
        .otherwise(
            (
                F.col("y_prev") * gap
                + (F.col("y_next") - F.col("y_prev")) * off
            ).cast("double")
            / gap
        )
        .alias("y_filled"),
    )


#: LTOB target buckets (interior); the first/last points are anchors.
_LTOB_BUCKETS = 48


@register(
    "downsample_lttb",
    ops=("A3", "W3", "W4", "F5"),
    doc="Largest-Triangle-One-Bucket downsampling of the daily revenue "
    "series (Steinarsson 2013, public thesis — the dashboard-"
    "rendering standard): the ~2.4k-day series is cut into 48 equal-"
    "rank buckets and each bucket keeps the visually most important "
    "point — the one maximizing the triangle area against its "
    "immediate neighbors (LAG/LEAD row frame); the series endpoints "
    "are unconditional anchors. All geometry is IEEE double "
    "arithmetic on (integer epoch-day, decimal-exact revenue) "
    "inputs — bitwise portable, no libm. The corpus-scale pass is "
    "the daily pre-aggregate; every window runs on the day frame "
    "(rows = days, invariant to fact volume). At 100 TB with many "
    "series, partition every window by the series key — the global "
    "windows here are day-bounded by construction.",
    oracle=f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
    {{dsum}} AS y
  FROM orders GROUP BY 1, 2
),
seq AS (
  SELECT d, x, y,
    ROW_NUMBER() OVER (ORDER BY d) AS rn,
    COUNT(*) OVER () AS m,
    LAG(x) OVER (ORDER BY d) AS xp, LAG(y) OVER (ORDER BY d) AS yp,
    LEAD(x) OVER (ORDER BY d) AS xn, LEAD(y) OVER (ORDER BY d) AS yn
  FROM daily
),
scored AS (
  SELECT d, y, rn, m,
    CASE WHEN rn = 1 THEN CAST(0 AS BIGINT)
         WHEN rn = m THEN CAST({_LTOB_BUCKETS} + 1 AS BIGINT)
         ELSE 1 + ((rn - 2) * {_LTOB_BUCKETS}) // GREATEST(m - 2, 1)
    END AS bucket,
    CASE WHEN rn = 1 OR rn = m THEN 0.0
         ELSE ABS((xp - xn) * (y - yp) - (xp - x) * (yn - yp))
    END AS area
  FROM seq
)
SELECT CAST(bucket AS BIGINT) AS bucket,
  CAST(d AS TIMESTAMP) AS d, y AS day_revenue, area
FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY bucket ORDER BY area DESC, d) AS rk
  FROM scored
) WHERE rk = 1
""".format(dsum="__DSUM__").replace("__DSUM__", "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)"),
)
def downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.to_date("o_orderdate").alias("d"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("x"),
    ).agg(N.dsum("o_totalprice").alias("y"))
    w = Window.orderBy("d")
    wall = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    seq = daily.select(
        "d",
        "x",
        "y",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("m"),
        F.lag("x").over(w).alias("xp"),
        F.lag("y").over(w).alias("yp"),
        F.lead("x").over(w).alias("xn"),
        F.lead("y").over(w).alias("yn"),
    )
    bucket = (
        F.when(F.col("rn") == 1, F.lit(0).cast("bigint"))
        .when(F.col("rn") == F.col("m"), F.lit(_LTOB_BUCKETS + 1).cast("bigint"))
        .otherwise(
            1
            + F.expr(
                f"((rn - 2) * {_LTOB_BUCKETS}) div greatest(m - 2, 1)"
            )
        )
    )
    area = F.when(
        (F.col("rn") == 1) | (F.col("rn") == F.col("m")), F.lit(0.0)
    ).otherwise(
        F.abs(
            (F.col("xp") - F.col("xn")) * (F.col("y") - F.col("yp"))
            - (F.col("xp") - F.col("x")) * (F.col("yn") - F.col("yp"))
        )
    )
    scored = seq.select(
        "d", "y", bucket.alias("bucket"), area.alias("area")
    )
    rk = F.row_number().over(
        Window.partitionBy("bucket").orderBy(F.col("area").desc(), "d")
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select(
            F.col("bucket").cast("bigint").alias("bucket"),
            F.col("d").cast("timestamp").alias("d"),
            F.col("y").alias("day_revenue"),
            "area",
        )
    )


#: Two-sided 5% normal critical value (stdlib literal, like the
#: multiple-testing tables in statsaudit).
_MK_CRIT = 1.959963984540054


@register(
    "mann_kendall_trend",
    ops=("J10", "A5", "A1", "P5"),
    doc="Mann-Kendall monotone-trend test per order priority over the "
    "1996 daily order-count series (Mann 1945 / Kendall 1975 — the "
    "nonparametric trend standard, dual of theilsen_trend's slope): "
    "S = Σ_{i<j} sign(y_j − y_i) summed over the day-pair grid, "
    "variance with the FULL tie correction Σt(t−1)(2t+5) (small "
    "integer daily counts tie heavily — the correction is load-"
    "bearing), continuity-corrected z, verdict vs a stdlib normal "
    "literal. S, n, and every tie term are exact integers; the only "
    "doubles are one division and one sqrt, written identically on "
    "both engines. The pair grid is days²-bounded (runs on the "
    "daily pre-aggregate, invariant to fact volume — same shape as "
    "theilsen_trend); at 100 TB the O(n log n) inversion-count "
    "formulation replaces the explicit grid.",
    oracle=f"""
WITH daily AS ({{_DAILY}}),
pairs AS (
  SELECT a.o_orderpriority,
    SUM(CASE WHEN b.n_orders > a.n_orders THEN 1
             WHEN b.n_orders < a.n_orders THEN -1 ELSE 0 END) AS s
  FROM daily a JOIN daily b
    ON a.o_orderpriority = b.o_orderpriority AND b.d > a.d
  GROUP BY 1
),
nn AS (
  SELECT o_orderpriority, COUNT(*) AS n FROM daily GROUP BY 1
),
ties AS (
  SELECT o_orderpriority,
    SUM(CASE WHEN t > 1 THEN t * (t - 1) * (2 * t + 5) ELSE 0 END) AS tie_term,
    SUM(CASE WHEN t > 1 THEN 1 ELSE 0 END) AS n_tied_groups
  FROM (
    SELECT o_orderpriority, n_orders, COUNT(*) AS t
    FROM daily GROUP BY 1, 2
  )
  GROUP BY 1
),
stat AS (
  SELECT p.o_orderpriority, p.s, nn.n, t.n_tied_groups,
    CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - t.tie_term AS DOUBLE) / 18.0
      AS var_s
  FROM pairs p
  JOIN nn ON p.o_orderpriority = nn.o_orderpriority
  JOIN ties t ON p.o_orderpriority = t.o_orderpriority
)
SELECT o_orderpriority,
  CAST(n AS BIGINT) AS n_days,
  CAST(s AS BIGINT) AS s_stat,
  CAST(n_tied_groups AS BIGINT) AS n_tied_groups,
  var_s,
  CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
       WHEN s < 0 THEN (s + 1) / sqrt(var_s)
       ELSE 0.0 END AS z,
  CASE WHEN (CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
                  WHEN s < 0 THEN (s + 1) / sqrt(var_s)
                  ELSE 0.0 END) >= {_MK_CRIT!r} THEN 'increasing'
       WHEN (CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
                  WHEN s < 0 THEN (s + 1) / sqrt(var_s)
                  ELSE 0.0 END) <= -{_MK_CRIT!r} THEN 'decreasing'
       ELSE 'none' END AS trend
FROM stat
""".replace("{_DAILY}", _DAILY_SQL),
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Four consumers (both pair sides, n, ties) over the days-sized
    # aggregate: checkpoint so the fact table is scanned once, not 4×.
    daily = (
        _daily(spark, sf_dir)
        .select("o_orderpriority", "d", "n_orders")
        .localCheckpoint()
    )
    return _mann_kendall_from_daily(daily)


def _mann_kendall_from_daily(daily: DataFrame) -> DataFrame:
    """Mann–Kendall S / var_s / z / verdict over a ``(o_orderpriority,
    d, n_orders)`` frame — split out so the property suite can feed a
    synthetic series (e.g. strictly increasing ⇒ S = n(n−1)/2,
    verdict 'increasing') through the SAME arithmetic the registered
    operator runs on the fixture."""
    a = daily.select(
        F.col("o_orderpriority").alias("prio"),
        F.col("d").alias("da"),
        F.col("n_orders").alias("ya"),
    )
    b = daily.select(
        F.col("o_orderpriority").alias("prio_b"),
        F.col("d").alias("db"),
        F.col("n_orders").alias("yb"),
    )
    pairs = (
        a.join(
            b,
            (F.col("prio") == F.col("prio_b")) & (F.col("db") > F.col("da")),
        )
        .groupBy("prio")
        .agg(
            F.sum(
                F.when(F.col("yb") > F.col("ya"), 1)
                .when(F.col("yb") < F.col("ya"), -1)
                .otherwise(0)
            ).alias("s")
        )
    )
    nn = daily.groupBy(F.col("o_orderpriority").alias("prio_n")).agg(
        F.count(F.lit(1)).alias("n")
    )
    t = F.col("t")
    ties = (
        daily.groupBy("o_orderpriority", "n_orders")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy(F.col("o_orderpriority").alias("prio_t"))
        .agg(
            F.sum(
                F.when(t > 1, t * (t - 1) * (2 * t + 5)).otherwise(0)
            ).alias("tie_term"),
            F.sum(F.when(t > 1, 1).otherwise(0)).alias("n_tied_groups"),
        )
    )
    stat = (
        pairs.join(nn, F.col("prio") == F.col("prio_n"))
        .join(ties, F.col("prio") == F.col("prio_t"))
        .select(
            "prio",
            "s",
            "n",
            "n_tied_groups",
            (
                (
                    F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                    - F.col("tie_term")
                ).cast("double")
                / 18.0
            ).alias("var_s"),
        )
    )
    z = (
        F.when(F.col("s") > 0, (F.col("s") - 1) / F.sqrt(F.col("var_s")))
        .when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(F.col("var_s")))
        .otherwise(F.lit(0.0))
    )
    return stat.select(
        F.col("prio").alias("o_orderpriority"),
        F.col("n").cast("bigint").alias("n_days"),
        F.col("s").cast("bigint").alias("s_stat"),
        F.col("n_tied_groups").cast("bigint").alias("n_tied_groups"),
        "var_s",
        z.alias("z"),
        F.when(z >= _MK_CRIT, "increasing")
        .when(z <= -_MK_CRIT, "decreasing")
        .otherwise("none")
        .alias("trend"),
    )
