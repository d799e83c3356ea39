"""The reference's analytical core, q2–q9, as driver-checkable
queries over the fixture tables.

`gtfs/analysis.py` implements the reference's nine analysis queries
(`sql/analysis_queries.sql:53-369`) verbatim over the GTFS star
schema; those run on synthesized warehouse frames, so the driver's
DuckDB oracle can't check them directly. This module re-expresses
each query's *shape* — the same join/agg/window structure, trend
labels, and ordering semantics — on the TPC-H-ish fixture tables, so
every analytical pattern gets a hash-checked CORRECTNESS row (q1's
twin is the flagship `perf_ranking_trends`).

Scale notes: dims broadcast; un-partitioned windows appear only over
pre-aggregated frames whose cardinality is bounded by the group-key
domain (days, months, weekdays, (nation, shipmode) pairs), exactly as
in the reference; all floating aggregates are decimal-exact so
results are partition-order independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import dim, table
from ..functions import numeric as N
from .registry import register
from .relational import REVENUE, SQL_REVENUE

#: Window-frame moving average, decimal-exact on both sides.
def _dec_ma(col: str, w) -> F.Column:
    return F.sum(F.col(col).cast(N.DEC)).over(w).cast("double") / F.count(
        F.lit(1)
    ).over(w)


def _sql_dec_ma(expr: str, win: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,4))) OVER {win} AS DOUBLE)"
        f" / COUNT(*) OVER {win}"
    )


@register(
    "analysis_daily_trend_ma7",
    ops=("W9", "A1", "A3", "F5"),
    doc="q2 shape — daily counts + average with 7-day moving averages "
    "of BOTH measures (ref `analysis_queries.sql:53-97`: daily delay "
    "count/avg + dual MA7). The price MA carries the exact per-day "
    "DECIMAL sums through the frame (a 7-day order-weighted mean): "
    "re-rounding the per-day double averages to decimal is not "
    "cross-engine deterministic — engines disagree on rational tie "
    "points — so the avg-of-avgs variant lives in gtfs/analysis.py "
    "q2 and this twin uses the exact-sum formulation.",
    oracle=f"""
WITH daily AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
         COUNT(*) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS sum_price_dec
  FROM orders GROUP BY 1
)
SELECT order_date, n_orders,
  CAST(sum_price_dec AS DOUBLE) / n_orders AS avg_price,
  {_sql_dec_ma("n_orders", "w")} AS ma7_orders,
  CAST(SUM(sum_price_dec) OVER w AS DOUBLE)
    / CAST(SUM(n_orders) OVER w AS DOUBLE) AS ma7_avg_price
FROM daily
WINDOW w AS (ORDER BY order_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
)
def analysis_daily_trend_ma7(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(N.DEC)).alias("sum_price_dec"),
    )
    w = Window.orderBy("order_date").rowsBetween(-6, 0)
    return daily.select(
        "order_date",
        "n_orders",
        (F.col("sum_price_dec").cast("double") / F.col("n_orders")).alias(
            "avg_price"
        ),
        _dec_ma("n_orders", w).alias("ma7_orders"),
        (
            F.sum("sum_price_dec").over(w).cast("double")
            / F.sum("n_orders").over(w).cast("double")
        ).alias("ma7_avg_price"),
    )


@register(
    "analysis_stop_hotspots",
    ops=("W7", "W11", "A3", "O1"),
    doc="q3 shape — per-supplier delay-hotspot percentile + cumulative "
    "share of the grand total, top 25 (ref `analysis_queries.sql:113-"
    "130`: stop hotspots with percent_rank + running share).",
    oracle=f"""
WITH per_supp AS (
  SELECT s.s_suppkey AS suppkey, s.s_name AS supp_name,
         {N.sql_dsum(SQL_REVENUE)} AS total_revenue,
         COUNT(*) AS n_items
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
)
SELECT suppkey, supp_name, total_revenue, n_items,
  PERCENT_RANK() OVER (ORDER BY total_revenue DESC, suppkey) AS pct_rank,
  CAST(SUM(CAST(total_revenue AS DECIMAL(18,4)))
       OVER (ORDER BY total_revenue DESC, suppkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
    / CAST(SUM(CAST(total_revenue AS DECIMAL(18,4))) OVER () AS DOUBLE) * 100.0
    AS cumulative_share
FROM per_supp
ORDER BY total_revenue DESC, suppkey
LIMIT 25
""",
)
def analysis_stop_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    s = dim(spark, sf_dir, "supplier")
    per_supp = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_suppkey").alias("suppkey"), F.col("s_name").alias("supp_name"))
        .agg(
            N.dsum(REVENUE()).alias("total_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    # Supplier-scaled global rank/share via the distributed two-phase
    # range rank; (total_revenue desc, suppkey) is a TOTAL order, so
    # RANK == ROW_NUMBER and PERCENT_RANK == (rank-1)/(n-1) exactly.
    from ..functions.ranking import two_phase_rank

    rev_dec = F.col("total_revenue").cast(N.DEC)
    ranked = two_phase_rank(
        per_supp,
        (F.col("total_revenue").desc(), "suppkey"),
        rank_col="_rk",
        cum={"_cum": rev_dec},
        totals={"_tot": rev_dec},
        n_col="_n",
    )
    return (
        ranked.select(
            "suppkey",
            "supp_name",
            "total_revenue",
            "n_items",
            F.when(F.col("_n") == 1, F.lit(0.0))
            .otherwise(
                (F.col("_rk") - 1).cast("double") / (F.col("_n") - 1)
            )
            .alias("pct_rank"),
            (
                F.col("_cum").cast("double")
                / F.col("_tot").cast("double")
                * F.lit(100.0)
            ).alias("cumulative_share"),
        )
        .orderBy(F.col("total_revenue").desc(), "suppkey")
        .limit(25)
    )


@register(
    "analysis_dow_pattern",
    ops=("W2", "W12", "A3", "F1", "F4"),
    doc="q4 shape — day-of-week pattern with prior-day LAG and "
    "vs-overall-average OVER () (ref `analysis_queries.sql:142-161`). "
    "PG DOW convention (0=Sunday). The overall mean is the exact "
    "order-weighted mean carried as DECIMAL sums through the OVER () "
    "frame (see analysis_daily_trend_ma7 for why avg-of-avgs is not "
    "cross-engine deterministic).",
    oracle="""
WITH per_day AS (
  SELECT CAST(dayofweek(o_orderdate) AS INT) AS pg_dow,
         dayname(o_orderdate) AS day_name,
         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS sum_price_dec,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1, 2
)
SELECT pg_dow, day_name,
  CAST(sum_price_dec AS DOUBLE) / n_orders AS avg_price,
  n_orders,
  LAG(CAST(sum_price_dec AS DOUBLE) / n_orders) OVER (ORDER BY pg_dow)
    AS prev_day_avg,
  CAST(sum_price_dec AS DOUBLE) / n_orders
    - CAST(SUM(sum_price_dec) OVER () AS DOUBLE)
      / CAST(SUM(n_orders) OVER () AS DOUBLE) AS vs_week_avg
FROM per_day
""",
)
def analysis_dow_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    per_day = o.groupBy(
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("pg_dow"),
        F.date_format("o_orderdate", "EEEE").alias("day_name"),
    ).agg(
        F.sum(F.col("o_totalprice").cast(N.DEC)).alias("sum_price_dec"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("pg_dow")
    all_w = Window.partitionBy()
    avg_price = F.col("sum_price_dec").cast("double") / F.col("n_orders")
    week_avg = F.sum("sum_price_dec").over(all_w).cast("double") / F.sum(
        "n_orders"
    ).over(all_w).cast("double")
    return per_day.select(
        "pg_dow",
        "day_name",
        avg_price.alias("avg_price"),
        "n_orders",
        F.lag(avg_price).over(w).alias("prev_day_avg"),
        (avg_price - week_avg).alias("vs_week_avg"),
    )


@register(
    "analysis_monthly_quartiles",
    ops=("W2", "W8", "W10", "A3", "F1", "F4"),
    doc="q5 shape — monthly trend with prior-month LAG, 3-month MA, "
    "and NTILE(4) quartile (ref `analysis_queries.sql:169-189`). The "
    "MA3 carries exact monthly DECIMAL sums through the frame (see "
    "analysis_daily_trend_ma7).",
    oracle="""
WITH monthly AS (
  SELECT CAST(year(o_orderdate) AS INT) AS y,
         CAST(month(o_orderdate) AS INT) AS m,
         monthname(o_orderdate) AS month_name,
         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS sum_price_dec,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1, 2, 3
)
SELECT y, m, month_name,
  CAST(sum_price_dec AS DOUBLE) / n_orders AS avg_price,
  n_orders,
  LAG(CAST(sum_price_dec AS DOUBLE) / n_orders) OVER (ORDER BY y, m)
    AS prev_month_avg,
  CAST(SUM(sum_price_dec) OVER w3 AS DOUBLE)
    / CAST(SUM(n_orders) OVER w3 AS DOUBLE) AS ma3_avg_price,
  NTILE(4) OVER (ORDER BY CAST(sum_price_dec AS DOUBLE) / n_orders, y, m)
    AS price_quartile
FROM monthly
WINDOW w3 AS (ORDER BY y, m ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
)
def analysis_monthly_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("m"),
        F.date_format("o_orderdate", "MMMM").alias("month_name"),
    ).agg(
        F.sum(F.col("o_totalprice").cast(N.DEC)).alias("sum_price_dec"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    t = Window.orderBy("y", "m")
    w3 = t.rowsBetween(-2, 0)
    avg_price = F.col("sum_price_dec").cast("double") / F.col("n_orders")
    return monthly.select(
        "y",
        "m",
        "month_name",
        avg_price.alias("avg_price"),
        "n_orders",
        F.lag(avg_price).over(t).alias("prev_month_avg"),
        (
            F.sum("sum_price_dec").over(w3).cast("double")
            / F.sum("n_orders").over(w3).cast("double")
        ).alias("ma3_avg_price"),
        F.ntile(4).over(Window.orderBy(avg_price, "y", "m")).alias("price_quartile"),
    )


@register(
    "analysis_route_stop_hotspots",
    ops=("W6", "A3", "A10", "J3"),
    doc="q6 shape — within-group DENSE_RANK + system-wide DENSE_RANK "
    "over (nation, brand) cells with HAVING n>=10, system top 20 "
    "(ref `analysis_queries.sql:204-240`: route×stop cells). The "
    "global rank window runs over the pre-aggregated cell frame "
    "(|nations|×|brands| rows), as in the reference.",
    oracle=f"""
WITH per_cell AS (
  SELECT n.n_name AS nation, p.p_brand AS brand,
         {N.sql_davg(SQL_REVENUE)} AS avg_revenue,
         COUNT(*) AS n_items
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= 10
)
SELECT * FROM (
  SELECT nation, brand, avg_revenue, n_items,
    DENSE_RANK() OVER (
      PARTITION BY nation ORDER BY avg_revenue DESC) AS nation_rank,
    DENSE_RANK() OVER (ORDER BY avg_revenue DESC) AS system_rank
  FROM per_cell
)
WHERE system_rank <= 20
""",
)
def analysis_route_stop_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = dim(spark, sf_dir, "part")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = dim(spark, sf_dir, "nation")
    per_cell = (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("p_brand").alias("brand"))
        .agg(
            N.davg(REVENUE()).alias("avg_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .filter(F.col("n_items") >= 10)
    )
    return (
        per_cell.select(
            "nation",
            "brand",
            "avg_revenue",
            "n_items",
            F.dense_rank()
            .over(Window.partitionBy("nation").orderBy(F.col("avg_revenue").desc()))
            .alias("nation_rank"),
            F.dense_rank()
            .over(Window.orderBy(F.col("avg_revenue").desc()))
            .alias("system_rank"),
        )
        .filter(F.col("system_rank") <= 20)
    )


@register(
    "analysis_delay_cascade",
    ops=("W3", "P5"),
    doc="q7 shape — cascade along each order's line sequence: prior "
    "line's quantity and return flag via LAG, Worsening/Recovering/"
    "Stable labels on the delta (ref `analysis_queries.sql:252-283`). "
    "l_linenumber ties within an order are broken by (partkey, "
    "suppkey) so the LAG order is total (SURVEY §7 determinism trap).",
    oracle="""
SELECT * FROM (
  SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
         l_returnflag AS returnflag, l_quantity AS quantity,
         LAG(l_quantity) OVER w AS prev_quantity,
         LAG(l_returnflag) OVER w AS prev_returnflag,
         CASE
           WHEN l_quantity - LAG(l_quantity) OVER w > 2 THEN 'Worsening'
           WHEN l_quantity - LAG(l_quantity) OVER w < -2 THEN 'Recovering'
           ELSE 'Stable'
         END AS cascade_trend
  FROM lineitem
  WINDOW w AS (PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_suppkey)
)
WHERE prev_quantity IS NOT NULL
""",
)
def analysis_delay_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey"
    )
    diff = F.col("quantity") - F.col("prev_quantity")
    return (
        l.select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_linenumber").alias("linenumber"),
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_quantity").alias("quantity"),
            F.lag("l_quantity").over(w).alias("prev_quantity"),
            F.lag("l_returnflag").over(w).alias("prev_returnflag"),
        )
        .filter(F.col("prev_quantity").isNotNull())
        .withColumn(
            "cascade_trend",
            F.when(diff > 2, "Worsening")
            .when(diff < -2, "Recovering")
            .otherwise("Stable"),
        )
    )


@register(
    "analysis_weather_impact",
    ops=("A1", "A3", "A4", "A8", "A9", "P8"),
    doc="q8 shape — per-severity-class distribution: count, decimal-"
    "exact avg + stddev, exact percentiles, NULLIF-guarded major-rate "
    "(ref `analysis_queries.sql:293-311`).",
    oracle=f"""
SELECT
  o_orderpriority AS priority,
  COUNT(*) AS n_orders,
  {N.sql_davg("o_totalprice")} AS avg_price,
  {N.sql_dstddev("o_totalprice")} AS stddev_price,
  quantile_cont(o_totalprice, 0.25) AS p25,
  quantile_cont(o_totalprice, 0.5) AS p50,
  quantile_cont(o_totalprice, 0.75) AS p75,
  quantile_cont(o_totalprice, 0.95) AS p95,
  CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS DOUBLE)
    / NULLIF(CAST(COUNT(*) AS DOUBLE), 0.0) * 100.0 AS major_pct
FROM orders
GROUP BY 1
""",
)
def analysis_weather_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        N.davg("o_totalprice").alias("avg_price"),
        N.dstddev("o_totalprice").alias("stddev_price"),
        F.expr("percentile(o_totalprice, 0.25)").alias("p25"),
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.75)").alias("p75"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
        (
            F.sum(F.when(F.col("o_totalprice") > 200000, 1).otherwise(0)).cast("double")
            / F.nullif(F.count(F.lit(1)).cast("double"), F.lit(0.0))
            * F.lit(100.0)
        ).alias("major_pct"),
    )


@register(
    "analysis_recent_vs_historical",
    ops=("A7", "F6", "O3", "P5"),
    doc="q9 shape — recent-7-day vs historical split in one pass via "
    "conditional AVG, trend labels, DESC NULLS LAST top 30 (ref "
    "`analysis_queries.sql:330-368`). The recency predicate is real "
    "date arithmetic (as_of − INTERVAL 7 DAY), not YYYYMMDD integer "
    "math — month boundaries are handled correctly.",
    oracle=f"""
WITH ranked AS (
  SELECT
    n.n_name AS nation,
    {N.sql_davg("CASE WHEN o.o_orderdate > TIMESTAMP '2001-08-01' - INTERVAL 7 DAY THEN o.o_totalprice END")}
      AS recent_7day_avg,
    {N.sql_davg("CASE WHEN o.o_orderdate <= TIMESTAMP '2001-08-01' - INTERVAL 7 DAY THEN o.o_totalprice END")}
      AS historical_avg,
    COUNT(*) AS n_orders
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1
)
SELECT nation, recent_7day_avg, historical_avg, n_orders,
  CASE
    WHEN recent_7day_avg > historical_avg + 1 THEN 'Degrading'
    WHEN recent_7day_avg < historical_avg - 1 THEN 'Improving'
    ELSE 'Stable'
  END AS trend
FROM ranked
ORDER BY recent_7day_avg DESC NULLS LAST, nation
LIMIT 30
""",
)
def analysis_recent_vs_historical(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = dim(spark, sf_dir, "nation")
    as_of = F.lit("2001-08-01").cast("timestamp")
    recent = F.col("o_orderdate") > as_of - F.expr("INTERVAL 7 DAY")
    agg = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            N.davg(F.when(recent, F.col("o_totalprice"))).alias("recent_7day_avg"),
            N.davg(F.when(~recent, F.col("o_totalprice"))).alias("historical_avg"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    return (
        agg.withColumn(
            "trend",
            F.when(
                F.col("recent_7day_avg") > F.col("historical_avg") + 1, "Degrading"
            )
            .when(F.col("recent_7day_avg") < F.col("historical_avg") - 1, "Improving")
            .otherwise("Stable"),
        )
        .orderBy(F.col("recent_7day_avg").desc_nulls_last(), "nation")
        .limit(30)
    )
