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
from ._util import _pin
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


@register(
    "event_funnel_steps",
    ops=("A5", "J1", "A9"),
    doc="Ordered conversion funnel view -> click -> purchase: per user "
    "the first view, the first click strictly after it, the first "
    "purchase strictly after that (step-wise min-timestamp "
    "progression — three user-keyed conditional aggregates chained by "
    "joins, no window over the whole stream, no per-row subqueries). "
    "Output is the classic funnel table: users surviving each stage "
    "and the stage-over-stage conversion rate. Every shuffle is keyed "
    "by user_id, so the plan partitions cleanly at any event volume.",
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_type, {SQL_EVENT_TIME} AS et FROM events
),
v AS (
  SELECT user_id, MIN(et) AS t1 FROM ev WHERE event_type = 'view'
  GROUP BY 1
),
c AS (
  SELECT ev.user_id, MIN(et) AS t2
  FROM ev JOIN v USING (user_id)
  WHERE ev.event_type = 'click' AND ev.et > v.t1
  GROUP BY 1
),
p AS (
  SELECT ev.user_id, MIN(et) AS t3
  FROM ev JOIN c USING (user_id)
  WHERE ev.event_type = 'purchase' AND ev.et > c.t2
  GROUP BY 1
),
n AS (
  SELECT (SELECT COUNT(*) FROM v) AS n1,
         (SELECT COUNT(*) FROM c) AS n2,
         (SELECT COUNT(*) FROM p) AS n3
)
SELECT 0 AS stage_id, 'view' AS stage, n1 AS n_users,
       1.0 AS conversion FROM n
UNION ALL SELECT 1, 'click', n2, CAST(n2 AS DOUBLE) / n1 FROM n
UNION ALL SELECT 2, 'purchase', n3, CAST(n3 AS DOUBLE) / n2 FROM n
""",
)
def event_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_time"
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("event_time").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("event_time") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("event_time").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("event_time") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("event_time").alias("t3"))
    )
    n = (
        v.agg(F.count(F.lit(1)).alias("n1"))
        .crossJoin(F.broadcast(c.agg(F.count(F.lit(1)).alias("n2"))))
        .crossJoin(F.broadcast(p.agg(F.count(F.lit(1)).alias("n3"))))
    )
    return n.select(
        F.expr(
            "stack(3,"
            " 0, 'view', n1, 1.0D,"
            " 1, 'click', n2, cast(n2 as double) / n1,"
            " 2, 'purchase', n3, cast(n3 as double) / n2)"
            " AS (stage_id, stage, n_users, conversion)"
        )
    )


@register(
    "retention_cohorts",
    ops=("A2", "F5", "A9"),
    doc="Weekly cohort retention triangle: users are cohorted by the "
    "week of their first event, activity is the distinct (user, "
    "active-week) set, and each (cohort_week, week_offset) cell "
    "counts surviving users with its retention rate against the "
    "cohort's week-0 size. Two user-keyed aggregates plus one "
    "cohort-keyed join — the denominators frame is cohort-count "
    "sized and broadcast. date_trunc is cast to TIMESTAMP on both "
    "engines (DuckDB returns DATE).",
    oracle=f"""
WITH ev AS (
  SELECT user_id,
         CAST(date_trunc('week', {SQL_EVENT_TIME}) AS TIMESTAMP) AS wk
  FROM events
),
first_seen AS (
  SELECT user_id, MIN(wk) AS cohort_week FROM ev GROUP BY 1
),
activity AS (SELECT DISTINCT user_id, wk FROM ev),
cells AS (
  SELECT f.cohort_week,
         date_diff('day', f.cohort_week, a.wk) // 7 AS week_offset,
         COUNT(DISTINCT a.user_id) AS n_active
  FROM activity a JOIN first_seen f USING (user_id)
  GROUP BY 1, 2
),
base AS (
  SELECT cohort_week, n_active AS cohort_size FROM cells
  WHERE week_offset = 0
)
SELECT c.cohort_week, c.week_offset, c.n_active,
       CAST(c.n_active AS DOUBLE) / b.cohort_size AS retention
FROM cells c JOIN base b USING (cohort_week)
""",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", "event_time").alias("wk")
    )
    first_seen = e.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    activity = e.distinct()

    # Pinned (r10): the cohort-cell frame (events distinct + join +
    # COUNT DISTINCT) feeds the diagonal-base extract AND the final
    # join — without the pin the whole cohort aggregation executed
    # twice (4 events scans in the before-plan). Cells are
    # week×offset-sized, constant-ish at any corpus scale.
    cells = _pin(
        activity.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    base = cells.filter(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_active").alias("cohort_size")
    )
    return cells.join(F.broadcast(base), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        (F.col("n_active").cast("double") / F.col("cohort_size")).alias(
            "retention"
        ),
    )


@register(
    "rfm_segments",
    ops=("A3", "W8", "F5"),
    doc="RFM customer segmentation over the event stream: per-user "
    "recency (days since last event, anchored to the corpus max "
    "event day so the query is frozen-deterministic), frequency, "
    "and monetary value, each cut into quartiles by NTILE(4) with "
    "a user_id tiebreak, concatenated into the classic segment "
    "code. The three global NTILE windows run over the per-user "
    "aggregate (users, not events) — the same bounded-global-window "
    "rationale as train_test_split.",
    oracle=f"""
WITH per_user AS (
  SELECT user_id,
         MAX(CAST({SQL_EVENT_TIME} AS DATE)) AS last_day,
         COUNT(*) AS frequency,
         {N.sql_dsum("value")} AS monetary
  FROM events
  GROUP BY user_id
),
anchor AS (SELECT MAX(last_day) AS anchor_day FROM per_user),
rfm AS (
  SELECT user_id,
         date_diff('day', last_day, a.anchor_day) AS recency_days,
         frequency, monetary
  FROM per_user, anchor a
)
SELECT user_id, recency_days, frequency, monetary,
  NTILE(4) OVER (ORDER BY recency_days ASC, user_id) AS r_quartile,
  NTILE(4) OVER (ORDER BY frequency DESC, user_id) AS f_quartile,
  NTILE(4) OVER (ORDER BY monetary DESC, user_id) AS m_quartile,
  CAST(NTILE(4) OVER (ORDER BY recency_days ASC, user_id) AS VARCHAR)
    || '-' ||
  CAST(NTILE(4) OVER (ORDER BY frequency DESC, user_id) AS VARCHAR)
    || '-' ||
  CAST(NTILE(4) OVER (ORDER BY monetary DESC, user_id) AS VARCHAR)
    AS rfm_segment
FROM rfm
""",
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.max(F.to_date("event_time")).alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        N.dsum("value").alias("monetary"),
    )
    anchor = per_user.agg(F.max("last_day").alias("anchor_day"))
    rfm = per_user.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        F.datediff(F.col("anchor_day"), F.col("last_day")).alias("recency_days"),
        "frequency",
        "monetary",
    )
    # Three NTILE(4)s over the per-user frame (entity-scaled): each
    # runs as the distributed two-phase range rank + the exact-integer
    # NTILE formula (functions/ranking.py) — never a single-partition
    # window. All three orders carry the user_id tiebreaker, so the
    # reconstruction is bitwise equal to the serial NTILE.
    from ..functions.ranking import ntile_from_rank, two_phase_rank

    ranked = two_phase_rank(
        rfm,
        (F.col("recency_days").asc(), "user_id"),
        rank_col="_rrn",
        n_col="_nu",
    )
    ranked = two_phase_rank(
        ranked, (F.col("frequency").desc(), "user_id"), rank_col="_frn"
    )
    ranked = two_phase_rank(
        ranked, (F.col("monetary").desc(), "user_id"), rank_col="_mrn"
    )
    nu = F.col("_nu")
    r = ntile_from_rank(F.col("_rrn"), nu, 4)
    f_ = ntile_from_rank(F.col("_frn"), nu, 4)
    m = ntile_from_rank(F.col("_mrn"), nu, 4)
    return ranked.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        r.alias("r_quartile"),
        f_.alias("f_quartile"),
        m.alias("m_quartile"),
        F.concat_ws(
            "-", r.cast("string"), f_.cast("string"), m.cast("string")
        ).alias("rfm_segment"),
    )


@register(
    "events_rate_anomaly",
    ops=("A3", "W9", "F5"),
    doc="Streaming-rate anomaly monitor (batch twin): hourly event "
    "counts per type, a trailing 24-observation baseline (ROWS "
    "frame, current hour excluded) summarized by ALL-INTEGER "
    "sufficient statistics (k, Σn, Σn² — exact, so the derived "
    "mean/std/z-score doubles are bitwise cross-engine), hours "
    "flagged where |z| > 3. The window partitions by event type and "
    "its state is 24 numbers — the shape a production rate monitor "
    "keeps per key at any volume.",
    oracle=f"""
WITH hourly AS (
  SELECT event_type,
         CAST(date_trunc('hour', {SQL_EVENT_TIME}) AS TIMESTAMP) AS hr,
         COUNT(*) AS n
  FROM events
  GROUP BY 1, 2
),
base AS (
  SELECT event_type, hr, n,
         COUNT(*) OVER w AS k,
         SUM(n) OVER w AS s1,
         SUM(n * n) OVER w AS s2
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hr
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, hr, n, k,
       ROUND(CAST(s1 AS DOUBLE) / k, 4) AS baseline_mean,
       ROUND((n - CAST(s1 AS DOUBLE) / k)
             / SQRT(GREATEST((CAST(s2 AS DOUBLE)
                              - CAST(s1 AS DOUBLE) * s1 / k) / (k - 1),
                             0.000001)), 4) AS zscore,
       (ABS((n - CAST(s1 AS DOUBLE) / k)
            / SQRT(GREATEST((CAST(s2 AS DOUBLE)
                             - CAST(s1 AS DOUBLE) * s1 / k) / (k - 1),
                            0.000001))) > 3.0) AS is_anomaly
FROM base
WHERE k >= 12
""",
)
def events_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "event_time").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(-24, -1)
    )
    base = hourly.select(
        "event_type",
        "hr",
        "n",
        F.count(F.lit(1)).over(w).alias("k"),
        F.sum("n").over(w).alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("s2"),
    ).filter(F.col("k") >= 12)
    mean = F.col("s1").cast("double") / F.col("k")
    var = F.greatest(
        (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("k"))
        / (F.col("k") - 1),
        F.lit(0.000001),
    )
    z = (F.col("n") - mean) / F.sqrt(var)
    return base.select(
        "event_type",
        "hr",
        "n",
        "k",
        F.round(mean, 4).alias("baseline_mean"),
        F.round(z, 4).alias("zscore"),
        (F.abs(z) > 3.0).alias("is_anomaly"),
    )


@register(
    "funnel_time_to_convert",
    ops=("A8", "A3", "J5"),
    doc="Funnel latency: per user the first view and the first "
    "purchase strictly after it, converted to integer seconds "
    "(exact nanosecond arithmetic), summarized as exact "
    "percentiles + min/max/mean — the time-to-convert companion of "
    "event_funnel_steps. Two user-keyed min-aggregates and one "
    "broadcast-size final rollup; no window over the raw stream.",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(epoch_ns(ts)) AS vt FROM events
  WHERE event_type = 'view' GROUP BY 1
),
p AS (
  SELECT e.user_id, MIN(epoch_ns(e.ts)) AS pt
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > v.vt
  GROUP BY 1
),
lat AS (
  SELECT v.user_id, (p.pt - v.vt) // 1000000000 AS sec
  FROM v JOIN p ON v.user_id = p.user_id
)
SELECT COUNT(*) AS n_converted,
       MIN(sec) AS min_sec,
       MAX(sec) AS max_sec,
       CAST(SUM(sec) AS DOUBLE) / COUNT(*) AS mean_sec,
       quantile_cont(sec, 0.5) AS median_sec,
       quantile_cont(sec, 0.9) AS p90_sec
FROM lat
""",
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("vt"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    lat = v.join(p, "user_id").select(
        F.expr("(pt - vt) div 1000000000").alias("sec")
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("sec").alias("min_sec"),
        F.max("sec").alias("max_sec"),
        (F.sum("sec").cast("double") / F.count(F.lit(1))).alias("mean_sec"),
        F.expr("percentile(sec, 0.5)").alias("median_sec"),
        F.expr("percentile(sec, 0.9)").alias("p90_sec"),
    )


@register(
    "event_markov_transitions",
    ops=("W3", "A1", "A9"),
    doc="First-order Markov transition matrix over per-user event "
    "sequences: LAG(event_type) per user ordered by time gives "
    "(prev → next) pairs; one aggregate yields counts and exact "
    "row-normalized transition probabilities. The per-user window is "
    "one user_id-keyed shuffle; the transition matrix is |types|² "
    "rows — constant-size output at any corpus scale (the standard "
    "user-journey model behind next-event prediction features).",
    oracle="""
WITH seq AS (
  SELECT event_type AS next_type,
    LAG(event_type) OVER (PARTITION BY user_id
                          ORDER BY epoch_ns(ts), event_id) AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, next_type, COUNT(*) AS n_transitions
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type, n_transitions,
  CAST(n_transitions AS DOUBLE)
    / SUM(n_transitions) OVER (PARTITION BY prev_type) AS transition_prob
FROM pairs
""",
)
def event_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            F.col("event_type").alias("next_type"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    row_w = Window.partitionBy("prev_type")
    return pairs.withColumn(
        "transition_prob",
        F.col("n_transitions").cast("double") / F.sum("n_transitions").over(row_w),
    )


@register(
    "event_attribution_last_touch",
    ops=("J7", "W3", "A3", "A9"),
    doc="Last-touch attribution: each purchase is credited to the "
    "user's most recent non-purchase event at-or-before it within a "
    "7-day lookback, else 'direct'. Same carry-forward composition as "
    "the as-of join (one user-keyed window, no range join); the "
    "output is one row per channel. Durations compared in exact "
    "integer nanoseconds.",
    oracle="""
WITH ordered AS (
  SELECT event_id, user_id, event_type, value, epoch_ns(ts) AS ts_ns,
    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS flag
  FROM events
), carried AS (
  SELECT event_type, value, ts_ns,
    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
               IGNORE NULLS) OVER w AS touch_type,
    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN ts_ns END
               IGNORE NULLS) OVER w AS touch_ts
  FROM ordered
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, flag, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), attributed AS (
  SELECT CASE WHEN touch_type IS NOT NULL
               AND ts_ns - touch_ts <= 604800000000000
              THEN touch_type ELSE 'direct' END AS channel,
         value
  FROM carried WHERE event_type = 'purchase'
), by_channel AS (
  SELECT channel, COUNT(*) AS n_purchases,
    {dsum} AS total_value
  FROM attributed GROUP BY channel
)
SELECT channel, n_purchases, total_value,
  CAST(n_purchases AS DOUBLE) / SUM(n_purchases) OVER () AS purchase_share
FROM by_channel
""".format(dsum=N.sql_dsum("value")),
)
def event_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    flag = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", flag.alias("flag"), "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_type = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    touch_ts = F.when(F.col("event_type") != "purchase", F.col("ts"))
    carried = e.select(
        "event_type",
        "value",
        F.col("ts").alias("ts_ns"),
        F.last(touch_type, ignorenulls=True).over(w).alias("touch_type"),
        F.last(touch_ts, ignorenulls=True).over(w).alias("touch_ts"),
    )
    attributed = carried.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.col("touch_type").isNotNull()
            & (F.col("ts_ns") - F.col("touch_ts") <= 604_800_000_000_000),
            F.col("touch_type"),
        )
        .otherwise(F.lit("direct"))
        .alias("channel"),
        "value",
    )
    by_channel = attributed.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        N.dsum("value").alias("total_value"),
    )
    return by_channel.withColumn(
        "purchase_share",
        F.col("n_purchases").cast("double")
        / F.sum("n_purchases").over(Window.partitionBy()),
    )


@register(
    "event_session_pmi",
    ops=("A11", "A9", "J1", "W3"),
    doc="Pointwise mutual information of event-type pairs co-occurring "
    "within the same 30-minute session (the association-mining signal "
    "behind 'users who err also contact support'): sessions from the "
    "standard gap rule, distinct (session, type) incidence, pair "
    "counts from a session-keyed self-join over a frame bounded by "
    "|types| per session, PMI = ln(n_ab·N/(n_a·n_b)) rounded to 4 "
    "decimals before comparison (house float-determinism rule for "
    "transcendentals). Output is at most |types|² rows.",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id, event_type, epoch_ns(ts) AS ts_ns,
    CASE WHEN epoch_ns(ts) - LAG(epoch_ns(ts)) OVER w > 1800000000000
         OR LAG(epoch_ns(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
), sess AS (
  SELECT user_id, event_type,
    SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS session_seq
  FROM flagged
), incidence AS (
  SELECT DISTINCT user_id, session_seq, event_type FROM sess
), totals AS (
  SELECT COUNT(DISTINCT (user_id, session_seq)) AS n_sessions FROM incidence
), per_type AS (
  SELECT event_type, COUNT(*) AS n_t FROM incidence GROUP BY event_type
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_co
  FROM incidence a
  JOIN incidence b
    ON a.user_id = b.user_id AND a.session_seq = b.session_seq
   AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, CAST(p.n_co AS BIGINT) AS n_co,
  CAST(ta.n_t AS BIGINT) AS n_a, CAST(tb.n_t AS BIGINT) AS n_b,
  CAST(t.n_sessions AS BIGINT) AS n_sessions,
  ROUND(ln(CAST(p.n_co AS DOUBLE) * t.n_sessions / (ta.n_t * tb.n_t)), 4)
    AS pmi
FROM pairs p
JOIN per_type ta ON p.type_a = ta.event_type
JOIN per_type tb ON p.type_b = tb.event_type
CROSS JOIN totals t
""",
)
def event_session_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ns = F.col("ts") - F.lag("ts").over(w)
    flagged = e.select(
        "user_id",
        "event_id",
        "event_type",
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

    # Pinned (r10): the session×type incidence frame (two per-user
    # window passes + a distinct shuffle) feeds FOUR consumers — the
    # session count, per-type marginals, and both co-occurrence join
    # sides; without the pin the sessionization executed 4× (5 events
    # scans in the before-plan).
    incidence = _pin(
        flagged.withColumn("session_seq", F.sum("is_start").over(run_w))
        .select("user_id", "session_seq", "event_type")
        .distinct()
    )
    totals = incidence.select("user_id", "session_seq").distinct().agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    per_type = incidence.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    a, b = incidence.alias("a"), incidence.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.session_seq") == F.col("b.session_seq"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_co"))
    )
    ta = per_type.select(F.col("event_type").alias("type_a"), F.col("n_t").alias("n_a"))
    tb = per_type.select(F.col("event_type").alias("type_b"), F.col("n_t").alias("n_b"))
    pmi = F.round(
        F.log(
            F.col("n_co").cast("double")
            * F.col("n_sessions")
            / (F.col("n_a") * F.col("n_b"))
        ),
        4,
    )
    return (
        pairs.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .crossJoin(F.broadcast(totals))
        .select(
            "type_a",
            "type_b",
            F.col("n_co").cast("bigint").alias("n_co"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.col("n_sessions").cast("bigint").alias("n_sessions"),
            pmi.alias("pmi"),
        )
    )


@register(
    "events_anomaly_mad",
    ops=("A8", "A1", "F5", "A11"),
    doc="Robust rate-anomaly detection via median absolute deviation "
    "(the MAD companion of events_rate_anomaly's stddev bands — "
    "robust to the very outliers it hunts): hourly counts per type, "
    "per-type median and MAD over integer counts (exact percentile "
    "interpolation, identical in both engines), anomalous hours at "
    "|count - median| > 3 x max(MAD, 0.5). The hourly pre-aggregate "
    "bounds everything downstream at hours x types rows.",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', {SQL_EVENT_TIME}) AS h,
    COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
med AS (
  SELECT event_type, quantile_cont(c, 0.5) AS med_rate
  FROM hourly GROUP BY event_type
),
mad AS (
  SELECT h.event_type, m.med_rate,
    quantile_cont(ABS(h.c - m.med_rate), 0.5) AS mad_rate
  FROM hourly h JOIN med m ON h.event_type = m.event_type
  GROUP BY h.event_type, m.med_rate
)
SELECT h.event_type,
  CAST(COUNT(*) AS BIGINT) AS n_hours,
  MAX(m.med_rate) AS median_rate,
  MAX(m.mad_rate) AS mad_rate,
  CAST(SUM(CASE WHEN ABS(h.c - m.med_rate)
                   > 3 * GREATEST(m.mad_rate, 0.5)
            THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous_hours
FROM hourly h JOIN mad m ON h.event_type = m.event_type
GROUP BY h.event_type
""",
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "event_time").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    med = hourly.groupBy("event_type").agg(
        F.expr("percentile(c, 0.5)").alias("med_rate")
    )
    mad = (
        hourly.join(med, "event_type")
        .groupBy("event_type", "med_rate")
        .agg(F.expr("percentile(abs(c - med_rate), 0.5)").alias("mad_rate"))
    )
    flagged = hourly.join(F.broadcast(mad), "event_type")
    is_anom = (
        F.abs(F.col("c") - F.col("med_rate"))
        > 3 * F.greatest(F.col("mad_rate"), F.lit(0.5))
    ).cast("int")
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.max("med_rate").alias("median_rate"),
        F.max("mad_rate").alias("mad_rate"),
        F.sum(is_anom).cast("bigint").alias("n_anomalous_hours"),
    )


@register(
    "ab_test_zscore",
    ops=("A5", "A9", "P5"),
    doc="Two-proportion A/B significance test: users assigned to "
    "variant A/B by the stateless md5 parity split (same recipe as "
    "hash_split_3way — reproducible on any cluster layout), "
    "conversion = ≥15 purchase events, z = (pA − pB) / "
    "sqrt(p̄(1−p̄)(1/nA+1/nB)). Counts are exact integers; the z "
    "arithmetic is per-row IEEE (sqrt is correctly rounded), so the "
    "single output row is bitwise deterministic. One user-level "
    "aggregate shuffles; the test itself runs on 2 rows.",
    oracle="""
WITH per_user AS (
  SELECT user_id,
    CASE WHEN (instr('0123456789abcdef',
                substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2 = 0
         THEN 'A' ELSE 'B' END AS variant,
    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 15 AS INT)
      AS converted
  FROM events GROUP BY 1
),
v AS (
  SELECT variant, COUNT(*) AS n, CAST(SUM(converted) AS BIGINT) AS conv
  FROM per_user GROUP BY 1
),
w AS (
  SELECT
    MAX(CASE WHEN variant = 'A' THEN n END) AS n_a,
    MAX(CASE WHEN variant = 'B' THEN n END) AS n_b,
    MAX(CASE WHEN variant = 'A' THEN conv END) AS conv_a,
    MAX(CASE WHEN variant = 'B' THEN conv END) AS conv_b
  FROM v
)
SELECT n_a, n_b, conv_a, conv_b,
  CAST(conv_a AS DOUBLE) / n_a AS p_a,
  CAST(conv_b AS DOUBLE) / n_b AS p_b,
  (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
    / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
           * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
           * (1.0 / n_a + 1.0 / n_b)) AS z_score,
  COALESCE(
    abs((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
      / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
             * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
             * (1.0 / n_a + 1.0 / n_b))) > 1.96,
    FALSE) AS significant
FROM w
""",
)
def ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    variant = F.when(
        (
            F.expr(
                "instr('0123456789abcdef',"
                " substring(md5(cast(user_id as string)), 1, 1)) - 1"
            )
            % 2
        )
        == 0,
        F.lit("A"),
    ).otherwise(F.lit("B"))
    per_user = e.groupBy("user_id", variant.alias("variant")).agg(
        (
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)) >= 15
        )
        .cast("int")
        .alias("converted")
    )
    v = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("converted").cast("long").alias("conv"),
    )
    w = v.agg(
        F.max(F.when(F.col("variant") == "A", F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == "B", F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == "A", F.col("conv"))).alias("conv_a"),
        F.max(F.when(F.col("variant") == "B", F.col("conv"))).alias("conv_b"),
    )
    p_a = F.col("conv_a").cast("double") / F.col("n_a")
    p_b = F.col("conv_b").cast("double") / F.col("n_b")
    p_pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (p_a - p_b) / F.sqrt(
        p_pool
        * (F.lit(1.0) - p_pool)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return w.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        p_a.alias("p_a"),
        p_b.alias("p_b"),
        z.alias("z_score"),
        # COALESCE: when both arms fully convert (possible on a
        # dup-saturated corpus) the pooled variance is 0, z is NULL
        # on both engines, and an undefined test is "not significant"
        # — a NULL boolean would also hash-diverge at the driver
        # (Spark's all-NULL bool stays object None in pandas while
        # DuckDB's becomes float NaN).
        F.coalesce(F.abs(z) > 1.96, F.lit(False)).alias("significant"),
    )


@register(
    "next_event_features",
    ops=("W1", "W3", "P6", "F5"),
    doc="Training-example assembly for next-event prediction: per "
    "user, each event becomes one example with lagged features "
    "(previous event type, previous value, gap to previous event in "
    "exact integer seconds) and the current event type as label — "
    "the sequence-model feature layout. One user-partitioned window "
    "sort produces every feature; no self-joins. User partitions are "
    "independent, so the plan scales with the user-key shuffle.",
    oracle="""
SELECT event_id, user_id,
  COALESCE(LAG(event_type) OVER w, 'NONE') AS prev_type,
  LAG(value) OVER w AS prev_value,
  (epoch_ns(ts) - LAG(epoch_ns(ts)) OVER w) // 1000000000 AS gap_sec,
  event_type AS label
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
""",
)
def next_event_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.coalesce(F.lag("event_type").over(w), F.lit("NONE")).alias("prev_type"),
        F.lag("value").over(w).alias("prev_value"),
        F.expr(
            "(ts - lag(ts) over (partition by user_id order by ts, event_id)) div 1000000000"
        ).alias("gap_sec"),
        F.col("event_type").alias("label"),
    )


@register(
    "event_path_analysis",
    ops=("W1", "W3", "A1", "O1"),
    doc="Top user paths: consecutive 3-step event sequences per user "
    "(two LAGs over the user-keyed order), counted corpus-wide and "
    "ranked — the path-mining view behind funnel design (which "
    "3-step flows dominate). One window sort shared by both LAGs, "
    "one hash count, a 10-row take-ordered tail; paths are strings "
    "so the count shuffle is key-bounded by observed path variety.",
    oracle="""
WITH seq AS (
  SELECT user_id,
    LAG(event_type, 2) OVER w AS s1,
    LAG(event_type, 1) OVER w AS s2,
    event_type AS s3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
),
paths AS (
  SELECT s1 || '>' || s2 || '>' || s3 AS path, COUNT(*) AS n_walks,
         COUNT(DISTINCT user_id) AS n_users
  FROM seq WHERE s1 IS NOT NULL
  GROUP BY 1
)
SELECT path, n_walks, n_users,
  ROW_NUMBER() OVER (ORDER BY n_walks DESC, path) AS rnk
FROM paths
QUALIFY rnk <= 10
""",
)
def event_path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.lag("event_type", 2).over(w).alias("s1"),
        F.lag("event_type", 1).over(w).alias("s2"),
        F.col("event_type").alias("s3"),
    ).filter(F.col("s1").isNotNull())
    paths = seq.groupBy(
        F.concat_ws(">", "s1", "s2", "s3").alias("path")
    ).agg(
        F.count(F.lit(1)).alias("n_walks"),
        F.countDistinct("user_id").alias("n_users"),
    )
    top = paths.orderBy(F.desc("n_walks"), "path").limit(10)
    wr = Window.orderBy(F.desc("n_walks"), "path")
    return top.withColumn("rnk", F.row_number().over(wr))


@register(
    "ab_srm_check",
    ops=("A1", "A9", "P5"),
    doc="Sample-ratio-mismatch guardrail — the pre-test every A/B "
    "readout must pass before its p-value means anything: observed "
    "variant populations vs the designed 50/50 split, χ²(1) = "
    "Σ(obs−exp)²/exp, flagged when χ² > 3.841 (α=0.05) or > 6.635 "
    "(α=0.01). Same md5-parity assignment as ab_test_zscore, exact "
    "integer counts, one user-level aggregate — the verdict row is "
    "computed on two cells.",
    oracle="""
WITH per_user AS (
  SELECT DISTINCT user_id,
    CASE WHEN (instr('0123456789abcdef',
                substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2 = 0
         THEN 'A' ELSE 'B' END AS variant
  FROM events
),
v AS (
  SELECT
    COUNT(CASE WHEN variant = 'A' THEN 1 END) AS n_a,
    COUNT(CASE WHEN variant = 'B' THEN 1 END) AS n_b
  FROM per_user
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
  CAST(n_a + n_b AS DOUBLE) / 2 AS expected_each,
  (n_a - CAST(n_a + n_b AS DOUBLE) / 2) * (n_a - CAST(n_a + n_b AS DOUBLE) / 2)
    / (CAST(n_a + n_b AS DOUBLE) / 2)
  + (n_b - CAST(n_a + n_b AS DOUBLE) / 2) * (n_b - CAST(n_a + n_b AS DOUBLE) / 2)
    / (CAST(n_a + n_b AS DOUBLE) / 2) AS chi2,
  ((n_a - CAST(n_a + n_b AS DOUBLE) / 2) * (n_a - CAST(n_a + n_b AS DOUBLE) / 2)
    / (CAST(n_a + n_b AS DOUBLE) / 2)
  + (n_b - CAST(n_a + n_b AS DOUBLE) / 2) * (n_b - CAST(n_a + n_b AS DOUBLE) / 2)
    / (CAST(n_a + n_b AS DOUBLE) / 2)) > 3.841 AS srm_at_05
FROM v
""",
)
def ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    variant = F.when(
        F.expr(
            "(instr('0123456789abcdef', substring(md5(cast(user_id as string)), 1, 1)) - 1) % 2"
        )
        == 0,
        F.lit("A"),
    ).otherwise(F.lit("B"))
    per_user = e.select("user_id").distinct().select(variant.alias("variant"))
    v = per_user.agg(
        F.count(F.when(F.col("variant") == "A", 1)).cast("bigint").alias("n_a"),
        F.count(F.when(F.col("variant") == "B", 1)).cast("bigint").alias("n_b"),
    )
    exp = (F.col("n_a") + F.col("n_b")).cast("double") / 2
    chi2 = (F.col("n_a") - exp) * (F.col("n_a") - exp) / exp + (
        F.col("n_b") - exp
    ) * (F.col("n_b") - exp) / exp
    return v.select(
        "n_a",
        "n_b",
        exp.alias("expected_each"),
        chi2.alias("chi2"),
        (chi2 > 3.841).alias("srm_at_05"),
    )


@register(
    "event_mix_entropy_daily",
    ops=("A3", "A9", "F5", "W2"),
    doc="Distribution-shift monitor: daily Shannon entropy of the "
    "event-type mix (plus day-over-day delta) — a collapsing mix "
    "(entropy drop) or a sudden diversification flags upstream "
    "breakage before any single-type alert fires. ln goes through "
    "the engine's rounded-transcendental recipe (4 dp before "
    "arithmetic); the per-day Σ p·ln p folds over a type-sorted "
    "array so the sum order is pinned. Day×type aggregate → "
    "day-sized frame.",
    oracle="""
WITH per AS (
  SELECT CAST(date_trunc('day', make_timestamp(epoch_ns(ts) // 1000)) AS TIMESTAMP)
           AS day, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
tot AS (SELECT day, SUM(n) AS day_n FROM per GROUP BY 1),
terms AS (
  SELECT p.day, p.event_type,
    -(CAST(p.n AS DOUBLE) / t.day_n)
      * ROUND(LN(CAST(p.n AS DOUBLE) / t.day_n), 4) AS term
  FROM per p JOIN tot t ON p.day = t.day
),
ent AS (
  SELECT day,
    ROUND(list_reduce(list(term ORDER BY event_type), (x, y) -> x + y), 6)
      AS entropy_nats
  FROM terms GROUP BY 1
)
SELECT day, entropy_nats,
  ROUND(entropy_nats - LAG(entropy_nats) OVER (ORDER BY day), 6) AS delta_vs_prev
FROM ent
""",
)
def event_mix_entropy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    per = e.groupBy(
        F.date_trunc("day", "event_time").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = per.groupBy("day").agg(F.sum("n").alias("day_n"))
    terms = per.join(tot, "day").select(
        "day",
        "event_type",
        (
            -(F.col("n").cast("double") / F.col("day_n"))
            * F.round(F.log(F.col("n").cast("double") / F.col("day_n")), 4)
        ).alias("term"),
    )
    ent = terms.groupBy("day").agg(
        F.round(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("event_type", "term"))),
                    lambda s: s["term"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("entropy_nats")
    )
    w = Window.orderBy("day")
    return ent.select(
        "day",
        "entropy_nats",
        F.round(F.col("entropy_nats") - F.lag("entropy_nats").over(w), 6).alias(
            "delta_vs_prev"
        ),
    )


#: CUPED pre-period length (days from the corpus start date).
CUPED_PRE_DAYS = 15


@register(
    "ab_cuped_adjustment",
    ops=("A3", "A4", "A9", "P3", "J5"),
    doc="CUPED variance reduction for the A/B metric: the event "
    "window splits at corpus start + 15 days into pre-period "
    "covariate X and experiment metric Y per user, "
    "θ = cov(X,Y)/var(X), and the adjusted-metric variance follows "
    "the identity var(Y−θX) = var(Y) − cov²/var(X) — computed from "
    "ONE pass of exact sufficient statistics (per-user sums "
    "quantized to exact 1e-4 integer units, cross-products summed "
    "in DECIMAL(38), VARCHAR-bridged to double on both engines), so "
    "no second corpus scan and bitwise determinism on any "
    "partitioning. The experimentation-platform primitive that cuts "
    "A/B run-time ~2× when pre-period behavior predicts the metric.",
    oracle=f"""
WITH bounds AS (
  SELECT CAST(MIN({SQL_EVENT_TIME}) AS DATE) + {CUPED_PRE_DAYS} AS cutoff
  FROM events
),
per_user AS (
  SELECT user_id,
    CAST(SUM(CASE WHEN CAST({SQL_EVENT_TIME} AS DATE) < b.cutoff
             THEN CAST(value AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4))
             END) * 10000 AS BIGINT) AS x,
    CAST(SUM(CASE WHEN CAST({SQL_EVENT_TIME} AS DATE) >= b.cutoff
             THEN CAST(value AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4))
             END) * 10000 AS BIGINT) AS y
  FROM events, bounds b GROUP BY user_id
),
s AS (
  SELECT COUNT(*) AS n,
    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
    CAST(CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
         AS VARCHAR) AS DOUBLE) AS sxy,
    CAST(CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
         AS VARCHAR) AS DOUBLE) AS sxx,
    CAST(CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
         AS VARCHAR) AS DOUBLE) AS syy
  FROM per_user
)
SELECT n AS n_users,
  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS theta,
  ROUND((n * syy - sy * sy) / (n * n) / 1e8, 4) AS var_y,
  ROUND(((n * syy - sy * sy) / (n * n)
         - ((n * sxy - sx * sy) / n) * ((n * sxy - sx * sy) / n)
           / ((n * sxx - sx * sx) / n) / n) / 1e8, 4) AS var_adj,
  ROUND(1.0 - ((n * syy - sy * sy)
               - (n * sxy - sx * sy) * ((n * sxy - sx * sy)
                  / (n * sxx - sx * sx)))
             / (n * syy - sy * sy), 6) AS var_reduction
FROM s
""",
)
def ab_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_add(F.min(F.to_date("event_time")), CUPED_PRE_DAYS).alias(
            "cutoff"
        )
    )
    dec0 = F.lit(0).cast("decimal(18,4)")
    pre = F.when(
        F.to_date("event_time") < F.col("cutoff"),
        F.col("value").cast("decimal(18,4)"),
    ).otherwise(dec0)
    post = F.when(
        F.to_date("event_time") >= F.col("cutoff"),
        F.col("value").cast("decimal(18,4)"),
    ).otherwise(dec0)
    per_user = (
        e.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            (F.sum(pre) * 10000).cast("bigint").alias("x"),
            (F.sum(post) * 10000).cast("bigint").alias("y"),
        )
    )
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    s = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(xd * yd).cast("string").cast("double").alias("sxy"),
        F.sum(xd * xd).cast("string").cast("double").alias("sxx"),
        F.sum(yd * yd).cast("string").cast("double").alias("syy"),
    )
    n = F.col("n")
    cxy = n * F.col("sxy") - F.col("sx") * F.col("sy")
    cxx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    cyy = n * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        n.alias("n_users"),
        F.round(cxy / cxx, 6).alias("theta"),
        F.round(cyy / (n * n) / F.lit(1e8), 4).alias("var_y"),
        F.round(
            (
                cyy / (n * n)
                - (cxy / n) * (cxy / n) / (cxx / n) / n
            )
            / F.lit(1e8),
            4,
        ).alias("var_adj"),
        F.round(
            F.lit(1.0) - (cyy - cxy * (cxy / cxx)) / cyy, 6
        ).alias("var_reduction"),
    )


@register(
    "point_in_time_features",
    ops=("J7", "W1", "W13", "A3"),
    doc="Point-in-time-correct training-set builder (the feature-store "
    "join that prevents label leakage): for every purchase event "
    "(the label row), features are computed from the user's history "
    "STRICTLY BEFORE the label timestamp — cumulative click count, "
    "last observed event value, and seconds since the user's first "
    "event — via one user-partitioned window pass with an exclusive "
    "frame (ROWS … 1 PRECEDING) and the deterministic (ts, event_id) "
    "order. A plain equi-join of 'latest features' would leak the "
    "future; this is the leakage-free as-of composition "
    "(generalizing asof_join_prior_purchase) and costs exactly one "
    "shuffle keyed by user_id at any event volume. Durations in "
    "exact integer nanoseconds.",
    oracle=f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, value, epoch_ns(ts) AS tns
  FROM events
),
feat AS (
  SELECT event_id, user_id, event_type, value, tns,
    COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER w, 0)
      AS f_clicks_before,
    LAST_VALUE(value IGNORE NULLS) OVER w AS f_last_value_before,
    MIN(tns) OVER w AS first_tns
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id,
  tns // 1000 AS label_ts_us,
  value AS label_value,
  CAST(f_clicks_before AS BIGINT) AS f_clicks_before,
  f_last_value_before,
  (tns - first_tns) // 1000000000 AS f_sec_since_first
FROM feat WHERE event_type = 'purchase'
""",
)
def point_in_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    feat = e.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "ts",
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).over(w),
            F.lit(0),
        )
        .cast("bigint")
        .alias("f_clicks_before"),
        F.last("value", ignorenulls=True).over(w).alias("f_last_value_before"),
        F.min("ts").over(w).alias("first_tns"),
    )
    return feat.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.expr("ts div 1000").alias("label_ts_us"),
        F.col("value").alias("label_value"),
        "f_clicks_before",
        "f_last_value_before",
        F.expr("(ts - first_tns) div 1000000000").alias("f_sec_since_first"),
    )


@register(
    "nearest_event_join",
    ops=("J7", "W1", "W3"),
    doc="Bidirectional nearest-event join — the two-sided complement "
    "of asof_join_prior_purchase: each click is matched to the "
    "user's temporally NEAREST purchase (before or after), the "
    "sensor-fusion / log-alignment semantic Spark has no operator "
    "for. Composition: union both event kinds, ONE user-partitioned "
    "window carrying the last purchase backward and the first "
    "purchase forward (exclusive frames both directions), then pick "
    "the nearer in exact integer nanoseconds (backward wins ties). "
    "One shuffle keyed by user_id — no range join, no per-row "
    "subquery, state bounded by the window frame at any volume.",
    oracle="""
WITH ev AS (
  SELECT event_id, user_id, event_type, value, epoch_ns(ts) AS tns
  FROM events WHERE event_type IN ('click', 'purchase')
),
marked AS (
  SELECT *,
    LAST_VALUE(CASE WHEN event_type = 'purchase' THEN tns END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY tns, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_tns,
    LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY tns, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_val,
    FIRST_VALUE(CASE WHEN event_type = 'purchase' THEN tns END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY tns, event_id
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_tns,
    FIRST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY tns, event_id
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_val
  FROM ev
)
SELECT event_id, user_id,
  tns // 1000 AS click_ts_us,
  CASE
    WHEN prev_tns IS NULL AND next_tns IS NULL THEN NULL
    WHEN next_tns IS NULL THEN prev_val
    WHEN prev_tns IS NULL THEN next_val
    WHEN tns - prev_tns <= next_tns - tns THEN prev_val
    ELSE next_val
  END AS nearest_purchase_value,
  CASE
    WHEN prev_tns IS NULL AND next_tns IS NULL THEN NULL
    WHEN next_tns IS NULL THEN tns - prev_tns
    WHEN prev_tns IS NULL THEN next_tns - tns
    WHEN tns - prev_tns <= next_tns - tns THEN tns - prev_tns
    ELSE next_tns - tns
  END AS gap_ns,
  CASE
    WHEN prev_tns IS NULL AND next_tns IS NULL THEN NULL
    WHEN next_tns IS NULL THEN 'backward'
    WHEN prev_tns IS NULL THEN 'forward'
    WHEN tns - prev_tns <= next_tns - tns THEN 'backward'
    ELSE 'forward'
  END AS direction
FROM marked WHERE event_type = 'click'
""",
)
def nearest_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    p_ts = F.when(F.col("event_type") == "purchase", F.col("ts"))
    p_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    marked = e.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.last(p_ts, ignorenulls=True).over(back).alias("prev_tns"),
        F.last(p_val, ignorenulls=True).over(back).alias("prev_val"),
        F.first(p_ts, ignorenulls=True).over(fwd).alias("next_tns"),
        F.first(p_val, ignorenulls=True).over(fwd).alias("next_val"),
    )
    both_null = F.col("prev_tns").isNull() & F.col("next_tns").isNull()
    back_wins = (F.col("ts") - F.col("prev_tns")) <= (
        F.col("next_tns") - F.col("ts")
    )
    nearest_val = (
        F.when(both_null, F.lit(None))
        .when(F.col("next_tns").isNull(), F.col("prev_val"))
        .when(F.col("prev_tns").isNull(), F.col("next_val"))
        .when(back_wins, F.col("prev_val"))
        .otherwise(F.col("next_val"))
    )
    gap = (
        F.when(both_null, F.lit(None))
        .when(F.col("next_tns").isNull(), F.col("ts") - F.col("prev_tns"))
        .when(F.col("prev_tns").isNull(), F.col("next_tns") - F.col("ts"))
        .when(back_wins, F.col("ts") - F.col("prev_tns"))
        .otherwise(F.col("next_tns") - F.col("ts"))
    )
    direction = (
        F.when(both_null, F.lit(None).cast("string"))
        .when(F.col("next_tns").isNull(), F.lit("backward"))
        .when(F.col("prev_tns").isNull(), F.lit("forward"))
        .when(back_wins, F.lit("backward"))
        .otherwise(F.lit("forward"))
    )
    return marked.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        F.expr("ts div 1000").alias("click_ts_us"),
        nearest_val.alias("nearest_purchase_value"),
        gap.alias("gap_ns"),
        direction.alias("direction"),
    )


@register(
    "source_freshness_monitor",
    ops=("A3", "A7", "F6", "P5"),
    doc="Source-freshness / arrival-lag monitor (the first dashboard an "
    "ops team builds over a streaming lake): per event type, the lag "
    "between its latest event and the corpus watermark (frozen 'now' "
    "= corpus max ts, the repo's deterministic current-time "
    "convention), the last-hour arrival count vs the trailing "
    "per-hour mean, and a staleness flag at 2× the trailing mean "
    "inter-arrival gap. All lags in exact integer nanoseconds; the "
    "rate ratio is one double division of exact counts. Two "
    "aggregates over the fact table, output |event types| rows.",
    oracle="""
WITH wm AS (SELECT MAX(epoch_ns(ts)) AS now_ns FROM events),
per_type AS (
  SELECT event_type,
    COUNT(*) AS n_events,
    MAX(epoch_ns(ts)) AS last_ns,
    MIN(epoch_ns(ts)) AS first_ns,
    SUM(CASE WHEN epoch_ns(ts) > (SELECT now_ns FROM wm) - 3600000000000
        THEN 1 ELSE 0 END) AS n_last_hour
  FROM events GROUP BY 1
)
SELECT p.event_type,
  CAST(p.n_events AS BIGINT) AS n_events,
  (w.now_ns - p.last_ns) // 1000000000 AS staleness_sec,
  CAST(p.n_last_hour AS BIGINT) AS n_last_hour,
  CAST(p.n_last_hour AS DOUBLE)
    / (CAST(p.n_events AS DOUBLE)
       / (CAST((p.last_ns - p.first_ns) AS DOUBLE) / 3600000000000.0))
    AS last_hour_vs_mean_rate,
  (w.now_ns - p.last_ns) * (p.n_events - 1) > 2 * (p.last_ns - p.first_ns)
    AS is_stale
FROM per_type p, wm w
""",
)
def source_freshness_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    wm = e.agg(F.max("ts").alias("now_ns"))
    per_type = (
        e.crossJoin(F.broadcast(wm))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("ts").alias("last_ns"),
            F.min("ts").alias("first_ns"),
            F.first("now_ns").alias("now_ns"),
            F.sum(
                F.when(
                    F.col("ts") > F.col("now_ns") - F.lit(3_600_000_000_000), 1
                ).otherwise(0)
            ).alias("n_last_hour"),
        )
    )
    mean_rate_per_hour = F.col("n_events").cast("double") / (
        (F.col("last_ns") - F.col("first_ns")).cast("double") / 3.6e12
    )
    return per_type.select(
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.expr("(now_ns - last_ns) div 1000000000").alias("staleness_sec"),
        F.col("n_last_hour").cast("bigint").alias("n_last_hour"),
        (F.col("n_last_hour").cast("double") / mean_rate_per_hour).alias(
            "last_hour_vs_mean_rate"
        ),
        (
            (F.col("now_ns") - F.col("last_ns")) * (F.col("n_events") - 1)
            > 2 * (F.col("last_ns") - F.col("first_ns"))
        ).alias("is_stale"),
    )


#: Packed-accumulator radix for the pattern automaton (state·R + count).
_DFA_RADIX = 1_000_000

#: Event codes folded by the automaton: 0=view 1=click 2=error
#: 3=purchase 4=other.
_SQL_EVENT_CODE = (
    "(CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1 "
    "WHEN 'error' THEN 2 WHEN 'purchase' THEN 3 ELSE 4 END)"
)


def _dfa_step_col(acc, x):
    """One transition of the 3-state pattern DFA (view→click→purchase, "
    "error kills the attempt, purchase restarts): accumulator is one "
    "packed int64 state·R + count. Pure integer arithmetic — the "
    "DuckDB twin in the oracle below is the same expression."""
    cnt = acc % _DFA_RADIX
    state = ((acc - cnt) / _DFA_RADIX).cast("bigint")
    new_state = (
        F.when(x == 2, F.lit(0).cast("bigint"))
        .when(x == 0, F.greatest(state, F.lit(1).cast("bigint")))
        .when(
            x == 1,
            F.when(state >= 1, F.lit(2).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            ),
        )
        .when(x == 3, F.lit(0).cast("bigint"))
        .otherwise(state)
    )
    new_cnt = cnt + F.when((x == 3) & (state == 2), 1).otherwise(0)
    return (new_state * _DFA_RADIX + new_cnt).cast("bigint")


def _dfa_step_sql(acc: str, e: str) -> str:
    """DuckDB spelling of :func:`_dfa_step_col` (``//`` int division)."""
    state = f"({acc} // {_DFA_RADIX})"
    cnt = f"({acc} % {_DFA_RADIX})"
    new_state = (
        f"(CASE WHEN {e} = 2 THEN 0"
        f" WHEN {e} = 0 THEN GREATEST({state}, 1)"
        f" WHEN {e} = 1 THEN (CASE WHEN {state} >= 1 THEN 2 ELSE 0 END)"
        f" WHEN {e} = 3 THEN 0"
        f" ELSE {state} END)"
    )
    new_cnt = f"({cnt} + (CASE WHEN {e} = 3 AND {state} = 2 THEN 1 ELSE 0 END))"
    return f"({new_state} * {_DFA_RADIX} + {new_cnt})"


@register(
    "event_pattern_automaton",
    ops=("A1", "A9", "W3", "P5"),
    doc="MATCH_RECOGNIZE-style sequence pattern matching (Spark has "
    "none): counts NON-OVERLAPPING completions of view→click→"
    "purchase per user where an intervening error kills the attempt "
    "— semantics the first-occurrence funnel (event_funnel_steps) "
    "cannot express. Each user's time-sorted event-code array is "
    "folded through a 3-state DFA whose accumulator is one packed "
    "int64 (state·10⁶ + count), all-integer arithmetic, so Spark's "
    "F.aggregate and DuckDB's list_reduce (init element prepended) "
    "agree exactly. One user-keyed aggregate; per-user state is "
    "O(events-per-user); the unbounded-stream twin is an "
    "applyInPandasWithState session fold.",
    oracle=f"""
WITH ev AS (
  SELECT user_id, {_SQL_EVENT_CODE} AS e, {SQL_EVENT_TIME} AS et, event_id
  FROM events
),
folded AS (
  SELECT user_id,
    list_reduce(
      list_prepend(CAST(0 AS BIGINT),
                   list(CAST(e AS BIGINT) ORDER BY et, event_id)),
      (acc, x) -> {_dfa_step_sql("acc", "x")}
    ) % {_DFA_RADIX} AS n_matches
  FROM ev GROUP BY 1
),
tot AS (SELECT COUNT(*) AS n_users_total, SUM(n_matches) AS total_matches
        FROM folded)
SELECT f.n_matches,
  CAST(COUNT(*) AS BIGINT) AS n_users,
  CAST(COUNT(*) AS DOUBLE) / t.n_users_total AS user_share,
  CAST(t.total_matches AS BIGINT) AS total_matches
FROM folded f, tot t
GROUP BY f.n_matches, t.n_users_total, t.total_matches
""",
)
def event_pattern_automaton(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_time",
        F.expr(_SQL_EVENT_CODE).cast("bigint").alias("e"),
    )
    codes = F.transform(
        F.array_sort(F.collect_list(F.struct("event_time", "event_id", "e"))),
        lambda s: s["e"],
    )
    folded = e.groupBy("user_id").agg(
        (
            F.aggregate(codes, F.lit(0).cast("bigint"), _dfa_step_col)
            % _DFA_RADIX
        ).alias("n_matches")
    )
    tot = folded.agg(
        F.count(F.lit(1)).alias("n_users_total"),
        F.sum("n_matches").alias("total_matches"),
    )
    return (
        folded.crossJoin(F.broadcast(tot))
        .groupBy("n_matches", "n_users_total", "total_matches")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .select(
            "n_matches",
            "n_users",
            (F.col("n_users").cast("double") / F.col("n_users_total")).alias(
                "user_share"
            ),
            F.col("total_matches").cast("bigint").alias("total_matches"),
        )
    )


#: Time-decay attribution: half-life 12h, lookback 7 days → decay
#: exponent h ∈ 0..13; weights are exact powers of two scaled to
#: int64 (2^(14−h)), so every credit is integer arithmetic.
_TDA_HALFLIFE_US = 12 * 3600 * 1_000_000
_TDA_LOOKBACK_US = 7 * 24 * 3600 * 1_000_000
_TDA_SCALE = 16384  # 2^14
_TDA_W_CASE = (
    "(CASE h "
    + " ".join(f"WHEN {h} THEN {2 ** (14 - h)}" for h in range(14))
    + " ELSE 0 END)"
)
#: credit_int → credited currency units: / (2^14 · 100 cents).
_TDA_DENOM = _TDA_SCALE * 100


@register(
    "time_decay_attribution",
    ops=("J7", "A2", "A3", "A9"),
    doc="Time-decay marketing attribution (the exponential-decay "
    "sibling of event_attribution_last_touch): every view/click in "
    "the 7 days before a purchase earns credit value·2^-⌊Δt/12h⌋. "
    "Half-life decay over a bounded lookback means the weight is an "
    "exact power of two (int64 via a 14-entry CASE table — no "
    "pow()), the purchase value is exact cents, and per-type credit "
    "totals are exact int64 sums — fully deterministic, no float "
    "accumulation anywhere; the only divisions are the final "
    "per-type readouts. The touch×purchase pairing is a user-keyed "
    "equi-join with a time-range predicate (pair count bounded by "
    "per-user activity × lookback).",
    oracle=f"""
WITH p AS (
  SELECT event_id AS p_id, user_id, epoch_ns(ts) // 1000 AS p_us,
    CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS t_us
  FROM events WHERE event_type IN ('view', 'click')
),
pair AS (
  SELECT t.event_type, p.p_id, p.cents,
    (p.p_us - t.t_us) // {_TDA_HALFLIFE_US} AS h
  FROM t JOIN p ON t.user_id = p.user_id
  WHERE t.t_us < p.p_us AND p.p_us - t.t_us <= {_TDA_LOOKBACK_US}
),
cred AS (
  SELECT event_type,
    COUNT(*) AS n_touches,
    COUNT(DISTINCT p_id) AS n_conversions_touched,
    SUM(cents * {_TDA_W_CASE}) AS credit_int
  FROM pair GROUP BY 1
),
g AS (SELECT SUM(credit_int) AS grand FROM cred)
SELECT c.event_type,
  CAST(c.n_touches AS BIGINT) AS n_touches,
  CAST(c.n_conversions_touched AS BIGINT) AS n_conversions_touched,
  CAST(c.credit_int AS DOUBLE) / {_TDA_DENOM} AS credited_value,
  CAST(c.credit_int AS DOUBLE) / g.grand AS credit_share
FROM cred c, g
""",
)
def time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.expr("ts DIV 1000").alias("p_us"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    t = e.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", "event_type", F.expr("ts DIV 1000").alias("t_us")
    )
    pair = t.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("t_us") < F.col("p_us"))
        & (F.col("p_us") - F.col("t_us") <= _TDA_LOOKBACK_US),
    ).select(
        "event_type",
        "p_id",
        "cents",
        F.expr(f"(p_us - t_us) DIV {_TDA_HALFLIFE_US}").alias("h"),
    )
    cred = pair.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        F.countDistinct("p_id").cast("bigint").alias("n_conversions_touched"),
        F.sum(F.col("cents") * F.expr(_TDA_W_CASE)).alias("credit_int"),
    )
    g = cred.agg(F.sum("credit_int").alias("grand"))
    return cred.crossJoin(F.broadcast(g)).select(
        "event_type",
        "n_touches",
        "n_conversions_touched",
        (F.col("credit_int").cast("double") / _TDA_DENOM).alias(
            "credited_value"
        ),
        (F.col("credit_int").cast("double") / F.col("grand")).alias(
            "credit_share"
        ),
    )


#: Shapley channels (bit positions in the touch mask) and the 3!-scaled
#: coalition weights w6(|S|) = |S|!·(2−|S|)!  ∈ {2, 1, 2}.
_SHAP_CHANNELS = (("view", 1), ("click", 2), ("signup", 4))
_SHAP_W6 = "(CASE bit_count(s) WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 2 END)"


@register(
    "shapley_channel_attribution",
    ops=("J7", "A5", "A9", "J10"),
    doc="Exact Shapley-value channel attribution over three touch "
    "channels (view/click/signup in the 7-day pre-purchase window): "
    "each purchase reduces to a 3-bit touch mask, coalition worth "
    "v(S) = Σ cents of purchases whose mask ⊆ S (an 8×8 subset-sum "
    "over the mask histogram), and the Shapley sum φ_i = "
    "Σ_{S∌i} |S|!(2−|S|)!/3! · (v(S∪i) − v(S)) is computed with "
    "3!-scaled INTEGER weights — every number up to the final "
    "readout divisions is exact int64, so the attribution is "
    "bitwise deterministic and the efficiency axiom (shares sum to "
    "1 over v(full)−v(∅)) holds exactly. Fact work is one "
    "purchase-keyed mask aggregate; the Shapley algebra runs on 8 "
    "coalition rows.",
    oracle=f"""
WITH p AS (
  SELECT event_id AS p_id, user_id, epoch_ns(ts) // 1000 AS p_us,
    CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS t_us
  FROM events WHERE event_type IN ('view', 'click', 'signup')
),
masked AS (
  SELECT p.p_id, MAX(p.cents) AS cents,
    COALESCE(BIT_OR(CASE t.event_type WHEN 'view' THEN 1
                    WHEN 'click' THEN 2 WHEN 'signup' THEN 4 END), 0) AS mask
  FROM p LEFT JOIN t
    ON t.user_id = p.user_id AND t.t_us < p.p_us
   AND p.p_us - t.t_us <= {_TDA_LOOKBACK_US}
  GROUP BY p.p_id
),
m AS (SELECT mask, SUM(cents) AS cents FROM masked GROUP BY 1),
coal AS (
  SELECT s.s, COALESCE(SUM(m.cents), 0) AS v
  FROM (SELECT UNNEST(generate_series(0, 7)) AS s) s
  LEFT JOIN m ON (m.mask & ~s.s) = 0
  GROUP BY 1
),
phi AS (
  SELECT ch.name AS channel,
    SUM((CASE bit_count(vs.s) WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 2 END) * (vb.v - vs.v)) AS phi6
  FROM (VALUES ('view', 1), ('click', 2), ('signup', 4)) ch(name, bit)
  JOIN coal vs ON (vs.s & ch.bit) = 0
  JOIN coal vb ON vb.s = vs.s + ch.bit
  GROUP BY 1
),
tot AS (
  SELECT (SELECT v FROM coal WHERE s = 7) - (SELECT v FROM coal WHERE s = 0)
    AS span
)
SELECT p.channel,
  CAST(p.phi6 AS DOUBLE) / 600 AS phi_value,
  CAST(p.phi6 AS DOUBLE) / (6 * t.span) AS phi_share
FROM phi p, tot t
""",
)
def shapley_channel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.expr("ts DIV 1000").alias("p_us"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    t = e.filter(
        F.col("event_type").isin("view", "click", "signup")
    ).select("user_id", "event_type", F.expr("ts DIV 1000").alias("t_us"))
    bit = (
        F.when(F.col("event_type") == "view", 1)
        .when(F.col("event_type") == "click", 2)
        .otherwise(4)
    )
    masked = (
        p.join(
            t,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("t_us") < F.col("p_us"))
            & (F.col("p_us") - F.col("t_us") <= _TDA_LOOKBACK_US),
            "left",
        )
        .groupBy("p_id")
        .agg(
            F.max("cents").alias("cents"),
            F.coalesce(
                F.bit_or(F.when(F.col("t_us").isNotNull(), bit)), F.lit(0)
            ).alias("mask"),
        )
    )
    m = masked.groupBy("mask").agg(F.sum("cents").alias("cents"))
    s = spark.range(8).select(F.col("id").cast("int").alias("s"))
    coal = (
        s.join(
            F.broadcast(m),
            F.expr("(mask & ~s) = 0"),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("cents"), F.lit(0)).alias("v"))
    )
    ch = spark.createDataFrame(
        list(_SHAP_CHANNELS), "channel string, bit int"
    )
    vs = coal.select(F.col("s"), F.col("v").alias("v_s"))
    vb = coal.select(F.col("s").alias("sb"), F.col("v").alias("v_sb"))
    phi = (
        ch.crossJoin(F.broadcast(vs))
        .filter(F.expr("(s & bit) = 0"))
        .join(F.broadcast(vb), F.expr("sb = s + bit"))
        .groupBy("channel")
        .agg(
            F.sum(
                F.expr(_SHAP_W6) * (F.col("v_sb") - F.col("v_s"))
            ).alias("phi6")
        )
    )
    span = coal.agg(
        (
            F.sum(F.when(F.col("s") == 7, F.col("v")).otherwise(0))
            - F.sum(F.when(F.col("s") == 0, F.col("v")).otherwise(0))
        ).alias("span")
    )
    return phi.crossJoin(F.broadcast(span)).select(
        "channel",
        (F.col("phi6").cast("double") / 600).alias("phi_value"),
        (F.col("phi6").cast("double") / (6 * F.col("span"))).alias(
            "phi_share"
        ),
    )


@register(
    "dau_wau_stickiness",
    ops=("A2", "A9", "F5", "A11"),
    doc="Product-analytics stickiness: per ISO week, weekly active "
    "users (exact distinct), the average of daily distinct-user "
    "counts over the week's observed days, and the DAU/WAU "
    "stickiness ratio — the engagement KPI every analytics stack "
    "reports. Two distinct-aggregates (day grain, week grain) on "
    "the deduplicated (day, user) frame; both shuffles keyed by "
    "calendar buckets. Ratios are single divisions of exact "
    "integers, identical operation order on both engines. At "
    "100 TB swap exact distincts for the KMV/HLL sketch operators "
    "(same plan shape, sketch state merges by week).",
    oracle=f"""
WITH ud AS (
  SELECT DISTINCT CAST({SQL_EVENT_TIME} AS DATE) AS d, user_id
  FROM events
),
dau AS (SELECT d, COUNT(*) AS dau FROM ud GROUP BY 1),
byweek AS (
  SELECT strftime(CAST(date_trunc('week', d) AS DATE), '%Y-%m-%d') AS week,
    COUNT(*) AS n_days,
    CAST(SUM(dau) AS BIGINT) AS sum_dau
  FROM dau GROUP BY 1
),
wau AS (
  SELECT strftime(CAST(date_trunc('week', d) AS DATE), '%Y-%m-%d') AS week,
    COUNT(DISTINCT user_id) AS wau
  FROM ud GROUP BY 1
)
SELECT b.week, CAST(b.n_days AS BIGINT) AS n_days, b.sum_dau,
  CAST(w.wau AS BIGINT) AS wau,
  CAST(b.sum_dau AS DOUBLE) / b.n_days AS avg_dau,
  (CAST(b.sum_dau AS DOUBLE) / b.n_days) / w.wau AS stickiness
FROM byweek b JOIN wau w ON b.week = w.week
""",
)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    ud = e.select(
        F.to_date("event_time").alias("d"), "user_id"
    ).distinct()
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    wk = F.date_format(
        F.date_trunc("week", F.col("d")).cast("date"), "yyyy-MM-dd"
    )
    byweek = dau.groupBy(wk.alias("week")).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("dau").cast("bigint").alias("sum_dau"),
    )
    wau = ud.groupBy(wk.alias("wweek")).agg(
        F.countDistinct("user_id").alias("wau")
    )
    return byweek.join(wau, F.col("week") == F.col("wweek")).select(
        "week",
        F.col("n_days").cast("bigint").alias("n_days"),
        "sum_dau",
        F.col("wau").cast("bigint").alias("wau"),
        (F.col("sum_dau").cast("double") / F.col("n_days")).alias("avg_dau"),
        (
            (F.col("sum_dau").cast("double") / F.col("n_days")) / F.col("wau")
        ).alias("stickiness"),
    )


@register(
    "variant_props_extract",
    ops=("P9", "A3", "F10", "A1"),
    doc="Semi-structured extraction through Spark 4's VARIANT type: "
    "props is parsed ONCE into the binary variant encoding "
    "(parse_json) and fields are pulled with typed variant_get — "
    "the engine-native path that replaces per-access JSON string "
    "re-parsing (json_props_extract is the portable string-regex "
    "twin of this operator; at 100 TB variant parse-once beats "
    "N×get_json_object by the number of accessed fields). Also "
    "exercises missing-key semantics (try-variant access of an "
    "absent path → NULL, counted per group). The DuckDB twin uses "
    "its native JSON extraction — each engine's idiomatic "
    "semi-structured path, same relational answer.",
    oracle="""
WITH parsed AS (
  SELECT event_type,
    CAST(json_extract_string(props, 'k') AS INT) AS k,
    json_extract_string(props, 'missing') AS missing
  FROM events
)
SELECT event_type,
  COUNT(*) AS n_events,
  COUNT(k) AS n_with_k,
  CAST(SUM(CASE WHEN missing IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_missing_field,
  CAST(SUM(k) AS BIGINT) AS sum_k,
  MIN(k) AS min_k,
  MAX(k) AS max_k,
  CAST(CAST(SUM(k) AS BIGINT) AS DOUBLE) / COUNT(k) AS avg_k
FROM parsed
GROUP BY 1
""",
)
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread=True: parse_json over every props string is CPU-heavy map
    # work; a single-row-group fixture would otherwise parse in ONE task
    # (measured 11.6 s vs ~2 s spread across cores at sf0.1).
    e = table(spark, sf_dir, "events", spread=True)
    parsed = e.select(
        "event_type",
        F.parse_json("props").alias("v"),
    ).select(
        "event_type",
        F.expr("variant_get(v, '$.k', 'int')").alias("k"),
        F.expr("try_variant_get(v, '$.missing', 'string')").alias("missing"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("k").alias("n_with_k"),
        F.sum(F.when(F.col("missing").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_missing_field"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        (F.sum("k").cast("bigint").cast("double") / F.count("k")).alias(
            "avg_k"
        ),
    )


@register(
    "session_window_dynamic_gap",
    ops=("W3", "A1", "A3", "F5", "P5"),
    doc="Native session_window with a DYNAMIC, per-event gap (view "
    "events keep sessions alive 15 min, everything else 45 min) — "
    "engagement-dependent sessionization that the fixed-gap "
    "sessionizers (sessionization_gap30m, streaming_session_"
    "window) can't express. Spark merges the per-event windows "
    "[t, t+gap) when they overlap; the oracle replicates the merge "
    "with the prefix-max-of-ends island rule (new session iff t ≥ "
    "max of all prior window ends for the user) — provably the "
    "same partition for sorted disjoint sessions. One user-keyed "
    "shuffle either way; session state is engine-managed and "
    "per-user bounded.",
    oracle=f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, value,
    {SQL_EVENT_TIME} AS t,
    {SQL_EVENT_TIME} + CASE WHEN event_type = 'view'
        THEN INTERVAL 15 MINUTE ELSE INTERVAL 45 MINUTE END AS e
  FROM events
),
marked AS (
  SELECT *,
    MAX(e) OVER (PARTITION BY user_id ORDER BY t, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      AS prev_end
  FROM ev
),
sid AS (
  SELECT *,
    SUM(CASE WHEN prev_end IS NULL OR t >= prev_end THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY t, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM marked
)
SELECT user_id,
  MIN(t) AS session_start,
  MAX(e) AS session_end,
  COUNT(*) AS n_events,
  {N.sql_dsum("value")} AS session_value
FROM sid
GROUP BY user_id, s
""",
)
def session_window_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "view", F.lit("15 minutes")).otherwise(
        F.lit("45 minutes")
    )
    return (
        e.groupBy("user_id", F.session_window("event_time", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            N.dsum("value").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


@register(
    "events_rolling_hour_range",
    ops=("W9", "A3", "F2"),
    doc="Per-event trailing-1-hour RANGE window keyed by the VALUE of "
    "the time axis (epoch seconds — Spark range frames are numeric): "
    "every event sees the count and decimal-exact value sum of its "
    "type's preceding hour, the per-event feature the tumbling "
    "hourly rollup can't express (events near bucket edges lose "
    "their recent context there). Computed as a bucketed TWO-PASS "
    "(VERDICT r7 item 7), not a sliding RANGE frame: a trailing "
    "[t-3599, t] window spans at most two hour buckets, so each "
    "event's answer is (its own bucket's inclusive prefix at t) + "
    "(the previous bucket's suffix past t-3600), and both pieces are "
    "CUMULATIVE frames — O(n) incremental evaluation over thousands "
    "of (type, hour) partitions — where Spark's sliding RANGE frame "
    "re-aggregates its whole buffer per row (O(n x frame density), "
    "15.7x at the x64 probe) and parallelizes only per type. The "
    "suffix lookup is a ghost-probe row at offset t mod 3600 in the "
    "previous bucket (suffix = bucket total - ghost's inclusive "
    "prefix; ghosts carry zero weight and are emitted only for the "
    "5% output sample), merged back by one event_id equi-join. Order "
    "inside a bucket is the single numeric key offset*2+is_ghost, so "
    "ONE RANGE-cumulative window serves real rows (offset ties "
    "inclusive) and ghosts (reals at the same offset inclusive) at "
    "once. The DuckDB twin keeps the declarative numeric-epoch RANGE "
    "frame.",
    oracle=f"""
WITH ev AS (
  SELECT event_id, event_type, value,
    epoch_ns(ts) // 1000000000 AS sec
  FROM events
),
w AS (
  SELECT event_id, event_type, sec,
    COUNT(*) OVER (PARTITION BY event_type ORDER BY sec
                   RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
      AS n_prev_hour,
    CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
        PARTITION BY event_type ORDER BY sec
        RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW) AS DOUBLE)
      AS value_prev_hour
  FROM ev
)
SELECT event_id, event_type, CAST(sec AS BIGINT) AS sec,
  CAST(n_prev_hour AS BIGINT) AS n_prev_hour, value_prev_hour
FROM w WHERE event_id % 20 = 0
""",
)
def events_rolling_hour_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    # Integer division: epoch nanos (~1.7e18) exceed double's 2^53
    # exact range, so a float divide would corrupt the low digits.
    sec = F.expr("ts div 1000000000")
    ev = e.select(
        "event_id",
        "event_type",
        "value",
        sec.cast("bigint").alias("sec"),
    ).select(
        "*",
        (F.col("sec") - F.col("sec") % 3600).alias("hr"),
        (F.col("sec") % 3600).alias("off"),
    )
    sampled = F.col("event_id") % 20 == 0
    real = ev.select(
        "event_id",
        "event_type",
        "sec",
        "hr",
        # single numeric order key: reals at 2*off, ghosts at
        # 2*off + 1 — a ghost's cumulative frame includes every real
        # row at its own offset, a real row's includes its offset ties
        # but no same-offset ghost.
        (F.col("off") * 2).alias("k"),
        F.lit(1).alias("w_n"),
        F.col("value").cast(N.DEC).alias("w_v"),
        # non-null-VALUE counter, carried alongside w_v so suffix
        # sums can be NULLed out when the suffix holds no non-null
        # value (SUM-over-frame semantics; ADVICE r8)
        F.col("value").isNotNull().cast("int").alias("w_nn"),
        F.lit(False).alias("is_ghost"),
    )
    ghosts = ev.filter(sampled).select(
        "event_id",
        "event_type",
        "sec",
        (F.col("hr") - 3600).alias("hr"),
        (F.col("off") * 2 + 1).alias("k"),
        F.lit(0).alias("w_n"),
        F.lit(None).cast(N.DEC).alias("w_v"),
        F.lit(0).alias("w_nn"),
        F.lit(True).alias("is_ghost"),
    )
    wcum = (
        Window.partitionBy("event_type", "hr")
        .orderBy("k")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("event_type", "hr")
    cum = real.unionByName(ghosts).select(
        "event_id",
        "event_type",
        "sec",
        "is_ghost",
        F.sum("w_n").over(wcum).alias("pre_n"),
        F.sum("w_v").over(wcum).alias("pre_v"),
        F.sum("w_nn").over(wcum).alias("pre_nn"),
        F.sum("w_n").over(wtot).alias("tot_n"),
        F.sum("w_v").over(wtot).alias("tot_v"),
        F.sum("w_nn").over(wtot).alias("tot_nn"),
    )
    own = cum.filter(~F.col("is_ghost") & sampled).select(
        "event_id",
        "event_type",
        "sec",
        F.col("pre_n").alias("own_n"),
        F.col("pre_v").alias("own_v"),
    )
    # Previous-bucket suffix past t-3600 = bucket total − inclusive
    # prefix at the ghost's offset. An empty previous bucket is a
    # one-ghost partition: total == prefix == the ghost's zero weight.
    # A suffix with zero non-null values must be NULL, not 0: when the
    # excluded prefix held the bucket's only non-null values,
    # tot_v − pre_v is 0 while SUM over the (all-NULL) suffix is NULL
    # (ADVICE r8; exercised by the NULL-valued rows the hypothesis
    # generator now draws in test_properties.py).
    rem = cum.filter(F.col("is_ghost")).select(
        "event_id",
        (F.col("tot_n") - F.col("pre_n")).alias("rem_n"),
        F.when(
            F.col("tot_nn") - F.col("pre_nn") == 0, F.lit(None).cast(N.DEC)
        )
        .otherwise(
            F.col("tot_v")
            - F.coalesce(F.col("pre_v"), F.lit(0).cast(N.DEC))
        )
        .alias("rem_v"),
    )
    zero = F.lit(0).cast(N.DEC)
    return own.join(rem, "event_id").select(
        "event_id",
        "event_type",
        "sec",
        (F.col("own_n") + F.col("rem_n")).cast("bigint").alias("n_prev_hour"),
        # NULL iff the whole trailing window held no non-null value
        # (exact SUM-over-frame semantics).
        F.when(
            F.col("own_v").isNull() & F.col("rem_v").isNull(),
            F.lit(None).cast(N.DEC),
        )
        .otherwise(
            F.coalesce(F.col("own_v"), zero) + F.coalesce(F.col("rem_v"), zero)
        )
        .cast("double")
        .alias("value_prev_hour"),
    )


@register(
    "interarrival_dispersion",
    ops=("W3", "A4", "A9", "F2"),
    doc="Queueing-health audit: per event type, the inter-arrival gap "
    "distribution's index of dispersion (variance/mean — 1 for a "
    "Poisson process, >1 = bursty, <1 = regular) from exact integer "
    "second gaps (LAG over the type-keyed order, decimal-exact "
    "Σgap and Σgap², one double division each at the end). The "
    "burstiness readout capacity planning reads next to the rate-"
    "anomaly monitors; one partitioned window + one hash aggregate.",
    oracle=f"""
WITH ev AS (
  SELECT event_type, epoch_ns(ts) // 1000000000 AS sec, event_id
  FROM events
),
gaps AS (
  SELECT event_type,
    sec - LAG(sec) OVER (PARTITION BY event_type
                         ORDER BY sec, event_id) AS gap
  FROM ev
),
s AS (
  SELECT event_type,
    COUNT(gap) AS n_gaps,
    CAST(CAST(SUM(CAST(gap AS DECIMAL(18,0))) AS VARCHAR) AS DOUBLE) AS s1,
    CAST(CAST(SUM(CAST(gap AS DECIMAL(19,0))
                  * CAST(gap AS DECIMAL(18,0))) AS VARCHAR) AS DOUBLE) AS s2
  FROM gaps WHERE gap IS NOT NULL
  GROUP BY 1
)
SELECT event_type,
  CAST(n_gaps AS BIGINT) AS n_gaps,
  s1 / n_gaps AS mean_gap_s,
  (s2 / n_gaps - (s1 / n_gaps) * (s1 / n_gaps)) / (s1 / n_gaps)
    AS index_of_dispersion,
  (s2 / n_gaps - (s1 / n_gaps) * (s1 / n_gaps)) / (s1 / n_gaps) > 1.0
    AS is_overdispersed
FROM s
""",
)
def interarrival_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    ev = e.select(
        "event_type", F.expr("ts div 1000000000").alias("sec"), "event_id"
    )
    w = Window.partitionBy("event_type").orderBy("sec", "event_id")
    gaps = ev.select(
        "event_type",
        (F.col("sec") - F.lag("sec").over(w)).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    g = F.col("gap").cast("decimal(18,0)")
    s = gaps.groupBy("event_type").agg(
        F.count("gap").alias("n_gaps"),
        F.sum(g).cast("double").alias("s1"),
        F.sum(g * g).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n_gaps")
    iod = (F.col("s2") / F.col("n_gaps") - mean * mean) / mean
    return s.select(
        "event_type",
        F.col("n_gaps").cast("bigint").alias("n_gaps"),
        mean.alias("mean_gap_s"),
        iod.alias("index_of_dispersion"),
        (iod > 1.0).alias("is_overdispersed"),
    )
