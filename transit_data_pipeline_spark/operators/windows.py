"""Window-function operators (SURVEY §2.5 W1–W14) — the reference's
analytical core, re-expressed on the driver tables.

Scale notes: every window here partitions by a key (nation, order,
user) except the deliberately-global ones (percent_rank/ntile/split),
which the reference also runs globally (`sql/analysis_queries.sql:127,189`;
`ml_feature_engineering.sql:472`). Global windows serialize into a
single partition — acceptable because their input is already an
aggregate (thousands of rows, not the fact table). Moving sums go
through DECIMAL so sliding-frame arithmetic is exact and
engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import numeric as N
from .registry import register
from .relational import REVENUE, SQL_REVENUE

_DAILY_REV = f"""
  SELECT strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
         {N.sql_dsum(SQL_REVENUE)} AS daily_revenue,
         COUNT(*) AS n_lineitems
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY 1
"""


def _daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"))
        .agg(
            N.dsum(REVENUE()).alias("daily_revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "lag_cascade",
    ops=("W3", "P2"),
    doc="LAG of two columns within a partition — delay-cascade pattern "
    "(ref previous-stop delay `analysis_queries.sql:252-259`).",
    oracle="""
WITH seq AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice,
         LAG(l_extendedprice) OVER w AS prev_price,
         LAG(l_partkey) OVER w AS prev_partkey
  FROM lineitem
  WINDOW w AS (PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_suppkey)
)
SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice,
       prev_price, prev_partkey,
       l_extendedprice - prev_price AS price_change
FROM seq
WHERE prev_price IS NOT NULL
""",
)
def lag_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey"
    )
    return (
        l.select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "l_extendedprice",
            F.lag("l_extendedprice").over(w).alias("prev_price"),
            F.lag("l_partkey").over(w).alias("prev_partkey"),
        )
        .filter(F.col("prev_price").isNotNull())
        .withColumn("price_change", F.col("l_extendedprice") - F.col("prev_price"))
    )


@register(
    "rank_suite",
    ops=("W6", "W7", "W8", "A3"),
    doc="DENSE_RANK within partition + global PERCENT_RANK + NTILE(4) "
    "(ref hotspot ranks `analysis_queries.sql:220-225`, stop percentile "
    "`:127`, quartile `:189`).",
    oracle=f"""
WITH monthly AS (
  SELECT n.n_name AS nation,
         CAST(month(o.o_orderdate) AS INT) AS order_month,
         {N.sql_dsum(SQL_REVENUE)} AS revenue
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE year(o.o_orderdate) = 1997
  GROUP BY 1, 2
)
SELECT nation, order_month, revenue,
  DENSE_RANK() OVER (PARTITION BY nation ORDER BY revenue DESC) AS within_nation_rank,
  PERCENT_RANK() OVER (ORDER BY revenue DESC, nation, order_month) AS global_pct_rank,
  NTILE(4) OVER (ORDER BY revenue, nation, order_month) AS revenue_quartile
FROM monthly
""",
)
def rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    monthly = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .filter(F.year("o_orderdate") == 1997)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.month("o_orderdate").cast("int").alias("order_month"),
        )
        .agg(N.dsum(REVENUE()).alias("revenue"))
    )
    return monthly.select(
        "nation",
        "order_month",
        "revenue",
        F.dense_rank()
        .over(Window.partitionBy("nation").orderBy(F.col("revenue").desc()))
        .alias("within_nation_rank"),
        F.percent_rank()
        .over(Window.orderBy(F.col("revenue").desc(), "nation", "order_month"))
        .alias("global_pct_rank"),
        F.ntile(4)
        .over(Window.orderBy("revenue", "nation", "order_month"))
        .alias("revenue_quartile"),
    )


@register(
    "moving_avg_7day",
    ops=("W9", "A3", "F5"),
    doc="7-day moving average over daily revenue, DECIMAL-exact sliding "
    "sums (ref 7-day MA `analysis_queries.sql:90-97`).",
    oracle=f"""
WITH daily AS ({_DAILY_REV})
SELECT ship_date, daily_revenue, n_lineitems,
  CAST(SUM(CAST(daily_revenue AS DECIMAL(18,4))) OVER w AS DOUBLE)
    / COUNT(*) OVER w AS ma7_revenue,
  CAST(SUM(n_lineitems) OVER w AS BIGINT) AS rolling_lineitems
FROM daily
WINDOW w AS (ORDER BY ship_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
)
def moving_avg_7day(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_revenue(spark, sf_dir)
    w = Window.orderBy("ship_date").rowsBetween(-6, 0)
    return daily.select(
        "ship_date",
        "daily_revenue",
        "n_lineitems",
        (
            F.sum(F.col("daily_revenue").cast(N.DEC)).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("ma7_revenue"),
        F.sum("n_lineitems").over(w).cast("long").alias("rolling_lineitems"),
    )


@register(
    "monthly_trend_ma3",
    ops=("W2", "W10", "A3", "F1"),
    doc="Un-partitioned LAG (prior month) + 3-month moving average "
    "(ref `analysis_queries.sql:152-153,184-187`).",
    oracle=f"""
WITH monthly AS (
  SELECT CAST(year(l_shipdate) AS INT) AS y,
         CAST(month(l_shipdate) AS INT) AS m,
         {N.sql_dsum(SQL_REVENUE)} AS revenue
  FROM lineitem
  GROUP BY 1, 2
)
SELECT y, m, revenue,
  LAG(revenue) OVER (ORDER BY y, m) AS prev_month_revenue,
  CAST(SUM(CAST(revenue AS DECIMAL(18,4)))
       OVER (ORDER BY y, m ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
    / COUNT(*) OVER (ORDER BY y, m ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    AS ma3_revenue
FROM monthly
""",
)
def monthly_trend_ma3(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    monthly = l.groupBy(
        F.year("l_shipdate").cast("int").alias("y"),
        F.month("l_shipdate").cast("int").alias("m"),
    ).agg(N.dsum(REVENUE()).alias("revenue"))
    order_w = Window.orderBy("y", "m")
    ma_w = order_w.rowsBetween(-2, 0)
    return monthly.select(
        "y",
        "m",
        "revenue",
        F.lag("revenue").over(order_w).alias("prev_month_revenue"),
        (
            F.sum(F.col("revenue").cast(N.DEC)).over(ma_w).cast("double")
            / F.count(F.lit(1)).over(ma_w)
        ).alias("ma3_revenue"),
    )


@register(
    "cumulative_share",
    ops=("W11", "W12", "A3"),
    doc="Running revenue share (cumulative SUM ÷ grand total OVER ()) "
    "and vs-grand-mean comparison (ref `analysis_queries.sql:124-126,154`).",
    oracle=f"""
WITH per_cust AS (
  SELECT o_custkey AS custkey, {N.sql_dsum("o_totalprice")} AS revenue
  FROM orders GROUP BY 1
)
SELECT custkey, revenue,
  CAST(SUM(CAST(revenue AS DECIMAL(18,4)))
       OVER (ORDER BY revenue DESC, custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
    / CAST(SUM(CAST(revenue AS DECIMAL(18,4))) OVER () AS DOUBLE) * 100.0
    AS cumulative_pct,
  CAST(SUM(CAST(revenue AS DECIMAL(18,4))) OVER () AS DOUBLE)
    / COUNT(*) OVER () AS grand_mean_revenue,
  revenue > CAST(SUM(CAST(revenue AS DECIMAL(18,4))) OVER () AS DOUBLE)
    / COUNT(*) OVER () AS above_average
FROM per_cust
""",
)
def cumulative_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import two_phase_rank

    o = table(spark, sf_dir, "orders")
    per_cust = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        N.dsum("o_totalprice").alias("revenue")
    )
    # Distributed two-phase running share — (revenue desc, custkey) is
    # a total order, so the range-partitioned running sum is bitwise
    # equal to the serial window; grand total / count come off the
    # per-partition summary instead of an unpartitioned OVER ().
    ranked = two_phase_rank(
        per_cust,
        (F.col("revenue").desc(), "custkey"),
        cum={"cum_dec": F.col("revenue").cast(N.DEC)},
        totals={"grand_dec": F.col("revenue").cast(N.DEC)},
        n_col="n_all",
    )
    grand = F.col("grand_dec").cast("double")
    grand_mean = grand / F.col("n_all")
    return ranked.select(
        "custkey",
        "revenue",
        (F.col("cum_dec").cast("double") / grand * F.lit(100.0)).alias(
            "cumulative_pct"
        ),
        grand_mean.alias("grand_mean_revenue"),
        (F.col("revenue") > grand_mean).alias("above_average"),
    )


@register(
    "train_test_split",
    ops=("W5", "W13", "S9"),
    doc="Deterministic time-ordered 80/20 split via global ROW_NUMBER vs "
    "COUNT(*) OVER () (ref train/test views "
    "`ml_feature_engineering.sql:468-519`).",
    oracle="""
SELECT o_orderkey,
  CASE WHEN rn <= total * 0.8 THEN 'train' ELSE 'test' END AS split
FROM (
  SELECT o_orderkey,
    ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) AS rn,
    COUNT(*) OVER () AS total
  FROM orders
)
""",
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import two_phase_rank

    o = table(spark, sf_dir, "orders")
    # Global ROW_NUMBER + COUNT(*) OVER () via the distributed
    # two-phase range rank — the fact-table sort never runs in one
    # partition; (o_orderdate, o_orderkey) is a total order.
    ranked = two_phase_rank(
        o.select("o_orderkey", "o_orderdate"),
        ("o_orderdate", "o_orderkey"),
        rank_col="_rn",
        n_col="_n",
    )
    return ranked.select(
        "o_orderkey",
        F.when(F.col("_rn") <= F.col("_n") * 0.8, "train")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "one_row_frame_lag",
    ops=("W14",),
    doc="AVG over ROWS BETWEEN 1 PRECEDING AND 1 PRECEDING ≡ LAG — the "
    "reference's previous-delay feature (`ml_feature_engineering.sql:375-379`); "
    "emits both spellings to prove equivalence.",
    oracle="""
SELECT event_id, user_id, value,
  AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 1 PRECEDING AND 1 PRECEDING) AS prev_value_frame,
  LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value_lag
FROM events
""",
)
def one_row_frame_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.avg("value").over(w.rowsBetween(-1, -1)).alias("prev_value_frame"),
        F.lag("value").over(w).alias("prev_value_lag"),
    )


@register(
    "scd2_user_type_history",
    ops=("W1", "W14", "S4"),
    doc="SCD Type-2 history build: treat each user's event stream as a "
    "slowly-changing attribute (event_type) and emit versioned rows "
    "with [valid_from, valid_to) and an is_current flag — the "
    "LAG-to-detect-change / LEAD-to-close-interval pattern a warehouse "
    "uses to version dimensions. Partitioned by user_id, so the window "
    "sort is per-user and the whole build is one shuffle at any scale. "
    "Ordering uses the raw nanosecond ts with event_id as a unique "
    "tiebreaker so the version sequence is a total order on both "
    "engines.",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type, event_id,
         make_timestamp(epoch_ns(ts) // 1000) AS et,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
), changes AS (
  SELECT user_id, event_type, et AS valid_from, event_id
  FROM ordered WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type, valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id) IS NULL AS is_current
FROM changes
""",
)
def scd2_user_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
        .select("user_id", "event_type", F.col("event_time").alias("valid_from"), "event_id")
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    closed = changes.withColumn("valid_to", F.lead("valid_from").over(w2))
    return closed.select(
        "user_id",
        "event_type",
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


@register(
    "rolling_distinct_users",
    ops=("A2", "W9", "F7"),
    doc="Trailing-7-day distinct active users per day. Spark has no "
    "COUNT(DISTINCT) OVER RANGE, and the naive per-day self-join is "
    "quadratic in window length x days; instead each (day, user) pair "
    "is exploded to the <=7 target days it contributes to and counted "
    "with one hash aggregate — linear in events, one shuffle, no "
    "window sort. The oracle proves equivalence with the literal "
    "interval-join spelling.",
    oracle="""
WITH ud AS (
  SELECT DISTINCT CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS d, user_id
  FROM events
), days AS (SELECT DISTINCT d FROM ud)
SELECT strftime(days.d, '%Y-%m-%d') AS day, COUNT(DISTINCT ud.user_id) AS users_7d
FROM ud JOIN days ON days.d BETWEEN ud.d AND ud.d + 6
GROUP BY 1
""",
)
def rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    ud = e.select(F.to_date("event_time").alias("d"), "user_id").distinct()
    days = ud.select(F.col("d").alias("day")).distinct()
    expanded = ud.withColumn(
        "day", F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 6)))
    )
    return (
        expanded.join(days, "day", "left_semi")
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("users_7d"))
    )


#: Bitemporal lookup instant for the SCD2 as-of query.
_SCD2_AS_OF = "2024-01-20"


@register(
    "scd2_as_of_lookup",
    ops=("W1", "W14", "P3", "J7"),
    doc="Bitemporal as-of query over the SCD Type-2 history "
    "scd2_user_type_history builds: resolve, for every user, the "
    "dimension version active at a fixed lookup instant "
    "(valid_from <= t < valid_to, open-ended current rows included) "
    "— the query pattern that makes versioned dimensions usable "
    "(reproduce yesterday's join exactly, audit what the model saw). "
    "The history build is the same one-shuffle per-user window "
    "chain; the as-of filter is a residual predicate on it, so the "
    "lookup costs nothing beyond the history itself. Also reports "
    "how long the resolved version had been active at the instant "
    "(exact integer seconds) and whether it is still current.",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, event_type, event_id,
         make_timestamp(epoch_ns(ts) // 1000) AS et,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
), changes AS (
  SELECT user_id, event_type, et AS valid_from, event_id
  FROM ordered WHERE prev_type IS NULL OR prev_type <> event_type
), versions AS (
  SELECT user_id, event_type, valid_from,
    LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id)
      AS valid_to
  FROM changes
)
SELECT user_id, event_type AS active_type, valid_from,
  valid_to IS NULL AS is_current,
  date_diff('second', valid_from, TIMESTAMP '{_SCD2_AS_OF}')
    AS active_for_sec
FROM versions
WHERE valid_from <= TIMESTAMP '{_SCD2_AS_OF}'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '{_SCD2_AS_OF}')
""",
)
def scd2_as_of_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id",
        "event_type",
        "event_id",
        F.timestamp_micros(F.expr("ts div 1000")).alias("et"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    changes = ordered.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    ).select("user_id", "event_type", F.col("et").alias("valid_from"), "event_id")
    wv = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    versions = changes.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
    )
    as_of = F.lit(_SCD2_AS_OF).cast("timestamp")
    return versions.filter(
        (F.col("valid_from") <= as_of)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > as_of))
    ).select(
        "user_id",
        F.col("event_type").alias("active_type"),
        "valid_from",
        F.col("valid_to").isNull().alias("is_current"),
        (
            (as_of.cast("long") - F.col("valid_from").cast("long"))
        ).alias("active_for_sec"),
    )


@register(
    "window_ignore_nulls_suite",
    ops=("W1", "W14", "P6", "F12"),
    doc="IGNORE NULLS window coverage: a sparse column (price visible "
    "only on every third key) is carried forward with last_value "
    "IGNORE NULLS (the windowed LOCF primitive under gap_fill_locf), "
    "first-seen via first_value IGNORE NULLS over the full frame, "
    "defaulted lag/lead offsets, and nth_value(2) over the running "
    "frame. Windows partition by status — no global sort; the "
    "emitted sample is 5% (filter AFTER the windows, so frames are "
    "computed over the full partition).",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
    CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice END AS sparse_price
  FROM orders
),
w AS (
  SELECT o_orderkey, o_orderstatus, sparse_price,
    last_value(sparse_price IGNORE NULLS) OVER (
      PARTITION BY o_orderstatus ORDER BY o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried,
    first_value(sparse_price IGNORE NULLS) OVER (
      PARTITION BY o_orderstatus ORDER BY o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      AS first_seen,
    lag(sparse_price, 3, -1.0) OVER (
      PARTITION BY o_orderstatus ORDER BY o_orderkey) AS lag3_default,
    lead(sparse_price, 2, -1.0) OVER (
      PARTITION BY o_orderstatus ORDER BY o_orderkey) AS lead2_default,
    nth_value(o_totalprice, 2) OVER (
      PARTITION BY o_orderstatus ORDER BY o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_price
  FROM base
)
SELECT o_orderkey, o_orderstatus, sparse_price, carried, first_seen,
  lag3_default, lead2_default, second_price
FROM w WHERE o_orderkey % 20 = 0
""",
)
def window_ignore_nulls_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_totalprice")).alias(
            "sparse_price"
        ),
    )
    wo = Window.partitionBy("o_orderstatus").orderBy("o_orderkey")
    wrun = wo.rowsBetween(Window.unboundedPreceding, 0)
    wall = wo.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    out = base.select(
        "o_orderkey",
        "o_orderstatus",
        "sparse_price",
        F.last("sparse_price", ignorenulls=True).over(wrun).alias("carried"),
        F.first("sparse_price", ignorenulls=True)
        .over(wall)
        .alias("first_seen"),
        F.lag("sparse_price", 3, -1.0).over(wo).alias("lag3_default"),
        F.lead("sparse_price", 2, -1.0).over(wo).alias("lead2_default"),
        F.nth_value("o_totalprice", 2).over(wrun).alias("second_price"),
    ).filter(F.col("o_orderkey") % 20 == 0)
    return out
