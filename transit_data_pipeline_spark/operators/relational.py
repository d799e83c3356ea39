"""Core relational operators (SURVEY §2.1–2.4, 2.6–2.8) expressed on
the driver's TPC-H-ish tables.

Each query re-expresses a reference operator pattern (file:line cited
per function) as a declarative DataFrame plan: scans get predicate
pushdown + column pruning from Catalyst, dimension joins are
broadcast, aggregates are partial+final hash aggs, and every floating
aggregate is decimal-exact so results are partition-order independent
(see functions/numeric.py).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import dim, table
from ..functions import numeric as N
from ..functions.ranking import two_phase_rank
from ._util import _pin
from .registry import register

# Revenue expression used throughout (kept textually identical on the
# oracle side so double arithmetic is bit-equal). Function, not module
# constant: Column construction needs an active SparkContext.
def REVENUE():
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


SQL_REVENUE = "l_extendedprice * (1.0 - l_discount)"


# ---------------------------------------------------------------------------
# Flagship: performance ranking with trends.
# Reference: "Route Performance Ranking with Trends"
# (`sql/analysis_queries.sql:1-50`): star join → two-level aggregate →
# LAG + ROW_NUMBER windows → rank filter → ordered top slice.
# ---------------------------------------------------------------------------
@register(
    "perf_ranking_trends",
    ops=("J3", "A3", "A5", "W1", "W4", "P4", "O1", "F1"),
    doc="Monthly per-nation revenue with prior-month LAG trend and "
    "ROW_NUMBER rank, top-5 nations per month (flagship).",
    oracle=f"""
WITH monthly AS (
  SELECT
    n.n_name AS nation,
    CAST(year(o.o_orderdate) AS INT) AS order_year,
    CAST(month(o.o_orderdate) AS INT) AS order_month,
    {N.sql_dsum(SQL_REVENUE)} AS total_revenue,
    COUNT(DISTINCT o.o_orderkey) AS n_orders
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2, 3
), ranked AS (
  SELECT
    nation, order_year, order_month, total_revenue, n_orders,
    LAG(total_revenue) OVER (
      PARTITION BY nation ORDER BY order_year, order_month) AS prev_month_revenue,
    ROW_NUMBER() OVER (
      PARTITION BY order_year, order_month
      ORDER BY total_revenue DESC, nation) AS revenue_rank
  FROM monthly
)
SELECT * FROM ranked WHERE revenue_rank <= 5
""",
)
def perf_ranking_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the single-row-group fixture scan otherwise serializes
    # the join+partial-agg map side (measured ~15% win at sf0.1 and ×8)
    lineitem = table(spark, sf_dir, "lineitem", spread=True)
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = dim(spark, sf_dir, "nation")

    monthly = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
        )
        .agg(
            N.dsum(REVENUE()).alias("total_revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )
    trend_w = Window.partitionBy("nation").orderBy("order_year", "order_month")
    rank_w = Window.partitionBy("order_year", "order_month").orderBy(
        F.col("total_revenue").desc(), F.col("nation")
    )
    return (
        monthly.withColumn("prev_month_revenue", F.lag("total_revenue").over(trend_w))
        .withColumn("revenue_rank", F.row_number().over(rank_w))
        .filter(F.col("revenue_rank") <= 5)
    )


# ---------------------------------------------------------------------------
# Projections / filters / predicates
# ---------------------------------------------------------------------------
@register(
    "filter_project_cast",
    ops=("P1", "P2", "P3", "P4", "P9", "F5"),
    doc="Pushed-down date-range + threshold + null-rejection filters "
    "with projection and casts (ref `load_gtfs_data.sql:128-138`, "
    "`streamlit_dashboard.py:87`).",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
  CAST(l_quantity AS INT) AS qty,
  l_extendedprice * (1.0 - l_discount) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount IS NOT NULL
  AND l_quantity > 25
""",
)
def filter_project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").isNotNull()
            & (F.col("l_quantity") > 25)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
            F.col("l_quantity").cast("int").alias("qty"),
            REVENUE().alias("revenue"),
        )
    )


@register(
    "case_coalesce_bounding",
    ops=("P5", "P6", "P7", "P8", "F8"),
    doc="CASE WHEN categorization, COALESCE defaulting, LEAST/GREATEST "
    "bounding, NULLIF-safe division (ref `fact_dim_tables.sql:335-340`, "
    "`:359-361`; `analysis_queries.sql:305`).",
    oracle="""
SELECT
  o_orderkey,
  CASE
    WHEN o_totalprice BETWEEN 1 AND 50000 THEN 'Minor'
    WHEN o_totalprice BETWEEN 50001 AND 150000 THEN 'Moderate'
    WHEN o_totalprice BETWEEN 150001 AND 300000 THEN 'Major'
    ELSE 'Extreme'
  END AS price_category,
  LEAST(100.0, GREATEST(0.0, o_totalprice / 5000.0)) AS bounded_score,
  COALESCE(o_orderpriority, 'UNKNOWN') AS priority,
  o_totalprice / NULLIF(CAST(o_orderkey % 5 AS DOUBLE), 0) AS safe_ratio
FROM orders
""",
)
def case_coalesce_bounding(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(price.between(1, 50000), "Minor")
        .when(price.between(50001, 150000), "Moderate")
        .when(price.between(150001, 300000), "Major")
        .otherwise("Extreme")
        .alias("price_category"),
        F.least(F.lit(100.0), F.greatest(F.lit(0.0), price / F.lit(5000.0))).alias(
            "bounded_score"
        ),
        F.coalesce(F.col("o_orderpriority"), F.lit("UNKNOWN")).alias("priority"),
        (price / F.nullif((F.col("o_orderkey") % 5).cast("double"), F.lit(0))).alias(
            "safe_ratio"
        ),
    )


@register(
    "distinct_projection",
    ops=("P10",),
    doc="DISTINCT projection over a join (ref `streamlit_dashboard.py:72`, "
    "`predict_delays.py:210-216`).",
    oracle="""
SELECT DISTINCT c.c_mktsegment AS mktsegment, o.o_orderpriority AS orderpriority
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
""",
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("mktsegment"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------
@register(
    "anti_join_orphans",
    ops=("J2",),
    doc="Left-anti join quality audit: customers with no urgent orders "
    "(ref orphan-trips audit `load_gtfs_data.sql:96-101`).",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
""",
)
def anti_join_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "semi_join_per_nation",
    ops=("J9", "J3", "A1"),
    doc="Left-semi membership filter + broadcast dim join "
    "(ref holiday semi-join `fact_dim_tables.sql:186-192`).",
    oracle="""
SELECT n.n_name AS nation, COUNT(*) AS n_active_customers
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY 1
""",
)
def semi_join_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    n = dim(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .join(n, F.col("c_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_active_customers"))
    )


@register(
    "star_join_region_rollup",
    ops=("J3", "J4", "A3", "A9", "F8"),
    doc="Five-way star join with broadcast dims, region/segment rollup "
    "(ref star joins `analysis_queries.sql:12-14`, MVs "
    "`performance_optimization.sql:39-41`).",
    oracle=f"""
SELECT
  r.r_name AS region,
  c.c_mktsegment AS mktsegment,
  COUNT(*) AS n_lineitems,
  {N.sql_dsum(SQL_REVENUE)} AS total_revenue,
  {N.sql_davg("l_quantity")} AS avg_quantity
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
""",
)
def star_join_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = dim(spark, sf_dir, "nation")
    r = dim(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            N.dsum(REVENUE()).alias("total_revenue"),
            N.davg("l_quantity").alias("avg_quantity"),
        )
    )


@register(
    "cross_join_grid",
    ops=("J10", "P6", "A1"),
    doc="Cross-join dimension grid with zero-filled counts "
    "(ref dim_time 24h x 15min grid `fact_dim_tables.sql:215-217`).",
    oracle="""
WITH grid AS (
  SELECT r.r_name AS region, p.o_orderpriority AS orderpriority
  FROM region r
  CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
), actual AS (
  SELECT r.r_name AS region, o.o_orderpriority AS orderpriority,
         COUNT(*) AS n_orders
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
)
SELECT g.region, g.orderpriority, COALESCE(a.n_orders, 0) AS n_orders
FROM grid g LEFT JOIN actual a
  ON g.region = a.region AND g.orderpriority = a.orderpriority
""",
)
def cross_join_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = dim(spark, sf_dir, "nation")
    r = dim(spark, sf_dir, "region")
    prios = o.select(F.col("o_orderpriority").alias("orderpriority")).distinct()
    grid = r.select(F.col("r_name").alias("region")).crossJoin(prios)
    actual = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("o_orderpriority").alias("orderpriority"))
        .agg(F.count(F.lit(1)).alias("n_orders_actual"))
    )
    return grid.join(actual, ["region", "orderpriority"], "left").select(
        "region",
        "orderpriority",
        F.coalesce(F.col("n_orders_actual"), F.lit(0)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------
@register(
    "conditional_aggregates",
    ops=("A1", "A2", "A5", "A6", "A7", "A9"),
    doc="COUNT DISTINCT, SUM(CASE WHEN), filtered COUNT, conditional "
    "AVG, ratio-of-aggregates (ref `analysis_queries.sql:11,61-62`, "
    "`:330-337`, `performance_optimization.sql:37`).",
    oracle=f"""
SELECT
  o_orderpriority AS priority,
  COUNT(*) AS n_orders,
  COUNT(DISTINCT o_custkey) AS n_customers,
  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
  COUNT(CASE WHEN o_totalprice > 200000 THEN 1 END) AS n_big,
  {N.sql_davg("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS avg_finished_price,
  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS DOUBLE) * 100.0
    / COUNT(*) AS pct_finished
FROM orders
GROUP BY 1
""",
)
def conditional_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    finished = F.col("o_orderstatus") == "F"
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.sum(F.when(finished, 1).otherwise(0)).alias("n_finished"),
        F.count(F.when(F.col("o_totalprice") > 200000, 1)).alias("n_big"),
        N.davg(F.when(finished, F.col("o_totalprice"))).alias("avg_finished_price"),
        (
            F.sum(F.when(finished, 1).otherwise(0)).cast("double")
            * F.lit(100.0)
            / F.count(F.lit(1))
        ).alias("pct_finished"),
    )


@register(
    "exact_percentiles",
    ops=("A8",),
    doc="Exact PERCENTILE_CONT 0.25/0.5/0.75/0.95 per group "
    "(ref `analysis_queries.sql:58-59,294-296`) — exact `percentile`, "
    "never percentile_approx.",
    oracle="""
SELECT
  o_orderstatus AS status,
  quantile_cont(o_totalprice, 0.25) AS p25,
  quantile_cont(o_totalprice, 0.5) AS p50,
  quantile_cont(o_totalprice, 0.75) AS p75,
  quantile_cont(o_totalprice, 0.95) AS p95
FROM orders
GROUP BY 1
""",
)
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("p25"),
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.75)").alias("p75"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
    )


@register(
    "stddev_by_group",
    ops=("A3", "A4"),
    doc="Sample STDDEV + AVG per group, decimal-exact "
    "(ref `analysis_queries.sql:141,293,323`).",
    oracle=f"""
SELECT
  l_returnflag AS returnflag,
  l_linestatus AS linestatus,
  COUNT(*) AS n_rows,
  {N.sql_davg("l_quantity")} AS avg_qty,
  {N.sql_dstddev("l_quantity")} AS stddev_qty,
  {N.sql_dsum("l_extendedprice")} AS sum_price
FROM lineitem
GROUP BY 1, 2
""",
)
def stddev_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy(
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_linestatus").alias("linestatus"),
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        N.davg("l_quantity").alias("avg_qty"),
        N.dstddev("l_quantity").alias("stddev_qty"),
        N.dsum("l_extendedprice").alias("sum_price"),
    )


@register(
    "two_level_agg_having",
    ops=("A10", "A11", "J1"),
    doc="Two-level aggregate (per-order totals → per-customer average) "
    "with HAVING (ref avg-trip-duration `fact_dim_tables.sql:268-280`, "
    "HAVING `analysis_queries.sql:208`).",
    oracle=f"""
WITH per_order AS (
  SELECT o.o_custkey AS custkey, l.l_orderkey AS orderkey,
         {N.sql_dsum(SQL_REVENUE)} AS order_revenue
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
)
SELECT
  custkey,
  COUNT(*) AS n_orders,
  {N.sql_davg("order_revenue")} AS avg_order_revenue
FROM per_order
GROUP BY 1
HAVING COUNT(*) >= 5
""",
)
def two_level_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    per_order = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_custkey").alias("custkey"), F.col("l_orderkey").alias("orderkey"))
        .agg(N.dsum(REVENUE()).alias("order_revenue"))
    )
    return (
        per_order.groupBy("custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            N.davg("order_revenue").alias("avg_order_revenue"),
        )
        .filter(F.col("n_orders") >= 5)
    )


@register(
    "global_stats",
    ops=("A12", "A3", "A1"),
    doc="Global no-group aggregates for load verification "
    "(ref `load_gtfs_data.sql:89-114`, `generate_synthetic_data.py:375-414`).",
    oracle=f"""
SELECT
  COUNT(*) AS n_rows,
  COUNT(DISTINCT l_orderkey) AS n_orders,
  strftime(MIN(l_shipdate), '%Y-%m-%d') AS min_ship,
  strftime(MAX(l_shipdate), '%Y-%m-%d') AS max_ship,
  {N.sql_dsum("l_quantity")} AS total_qty,
  {N.sql_davg("l_extendedprice")} AS avg_price
FROM lineitem
""",
)
def global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("min_ship"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("max_ship"),
        N.dsum("l_quantity").alias("total_qty"),
        N.davg("l_extendedprice").alias("avg_price"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k, set ops, dedup-upsert
# ---------------------------------------------------------------------------
@register(
    "topk_orders",
    ops=("O1", "O3", "O4"),
    doc="Top-25 by value with DESC NULLS LAST and explicit tiebreaker "
    "(ref `analysis_queries.sql:367-368`; TakeOrderedAndProject plan).",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC NULLS LAST, o_orderkey
LIMIT 25
""",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey"))
        .limit(25)
    )


@register(
    "union_all_counts",
    ops=("U1", "A1"),
    doc="UNION ALL record-count verification across tables "
    "(ref `load_gtfs_data.sql:244-267`, `fact_dim_tables.sql:416-424`).",
    oracle="""
SELECT 'region' AS table_name, COUNT(*) AS n_rows FROM region
UNION ALL SELECT 'nation', COUNT(*) FROM nation
UNION ALL SELECT 'customer', COUNT(*) FROM customer
UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
UNION ALL SELECT 'part', COUNT(*) FROM part
UNION ALL SELECT 'orders', COUNT(*) FROM orders
UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
UNION ALL SELECT 'events', COUNT(*) FROM events
""",
)
def union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events")
    counts = [
        table(spark, sf_dir, t).agg(
            F.lit(t).alias("table_name"), F.count(F.lit(1)).alias("n_rows")
        )
        for t in names
    ]
    return reduce(DataFrame.unionByName, counts)


@register(
    "dedup_first_wins",
    ops=("S4", "W4"),
    doc="ON CONFLICT DO NOTHING semantics: first-row-wins dedup via "
    "ROW_NUMBER over a deterministic order, never dropDuplicates "
    "(ref `load_gtfs_data.sql:139` + SURVEY §7 trap).",
    oracle="""
SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber
FROM (
  SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
         ROW_NUMBER() OVER (
           PARTITION BY l_orderkey
           ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
  FROM lineitem
)
WHERE rn = 1
""",
)
def dedup_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey"
    )
    return (
        l.select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Scalar function surface: date parts, smart keys, series, binning
# ---------------------------------------------------------------------------
@register(
    "date_parts_smart_keys",
    ops=("F1", "F3", "F4", "F5", "P5"),
    doc="EXTRACT family + YYYYMMDD smart key + day/month names + "
    "season/weekend CASE (ref `fact_dim_tables.sql:161-178`). "
    "PG DOW convention (0=Sunday) via dayofweek(d)-1.",
    oracle="""
SELECT DISTINCT
  CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS date_key,
  CAST(year(o_orderdate) AS INT) AS order_year,
  CAST(quarter(o_orderdate) AS INT) AS order_quarter,
  CAST(month(o_orderdate) AS INT) AS order_month,
  CAST(weekofyear(o_orderdate) AS INT) AS order_week,
  CAST(day(o_orderdate) AS INT) AS order_dom,
  CAST(dayofweek(o_orderdate) AS INT) AS pg_dow,
  dayname(o_orderdate) AS day_name,
  monthname(o_orderdate) AS month_name,
  CASE WHEN dayofweek(o_orderdate) IN (0, 6) THEN TRUE ELSE FALSE END AS is_weekend,
  CASE
    WHEN month(o_orderdate) IN (12, 1, 2) THEN 'Winter'
    WHEN month(o_orderdate) IN (3, 4, 5) THEN 'Spring'
    WHEN month(o_orderdate) IN (6, 7, 8) THEN 'Summer'
    ELSE 'Fall'
  END AS season
FROM orders
""",
)
def date_parts_smart_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    pg_dow = (F.dayofweek(d) - 1).cast("int")
    month = F.month(d)
    return o.select(
        F.date_format(d, "yyyyMMdd").cast("int").alias("date_key"),
        F.year(d).cast("int").alias("order_year"),
        F.quarter(d).cast("int").alias("order_quarter"),
        month.cast("int").alias("order_month"),
        F.weekofyear(d).cast("int").alias("order_week"),
        F.dayofmonth(d).cast("int").alias("order_dom"),
        pg_dow.alias("pg_dow"),
        F.date_format(d, "EEEE").alias("day_name"),
        F.date_format(d, "MMMM").alias("month_name"),
        pg_dow.isin(0, 6).alias("is_weekend"),
        F.when(month.isin(12, 1, 2), "Winter")
        .when(month.isin(3, 4, 5), "Spring")
        .when(month.isin(6, 7, 8), "Summer")
        .otherwise("Fall")
        .alias("season"),
    ).distinct()


@register(
    "dim_date_series",
    ops=("F7", "F1", "J10"),
    doc="dim_date generation via sequence+explode "
    "(ref generate_series `fact_dim_tables.sql:179-183`).",
    oracle="""
SELECT
  strftime(d, '%Y-%m-%d') AS full_date,
  CAST(strftime(d, '%Y%m%d') AS INT) AS date_key,
  CAST(year(d) AS INT) AS y,
  CAST(month(d) AS INT) AS m,
  CAST(dayofweek(d) AS INT) AS pg_dow
FROM generate_series(DATE '1995-01-01', DATE '1995-12-31', INTERVAL 1 DAY) AS t(d)
""",
)
def dim_date_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1995-12-31").cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("full_date")
    )
    d = F.col("full_date")
    return days.select(
        F.date_format(d, "yyyy-MM-dd").alias("full_date"),
        F.date_format(d, "yyyyMMdd").cast("int").alias("date_key"),
        F.year(d).cast("int").alias("y"),
        F.month(d).cast("int").alias("m"),
        (F.dayofweek(d) - 1).cast("int").alias("pg_dow"),
    )


@register(
    "risk_binning",
    ops=("F13", "A1"),
    doc="Threshold binning into risk levels + distribution count "
    "(ref pd.cut risk_level `predict_delays.py:348-352,411-415`).",
    oracle="""
SELECT
  CASE
    WHEN o_totalprice <= 50000 THEN 'Low'
    WHEN o_totalprice <= 150000 THEN 'Medium'
    WHEN o_totalprice <= 300000 THEN 'High'
    ELSE 'Severe'
  END AS risk_level,
  COUNT(*) AS n_orders
FROM orders
GROUP BY 1
""",
)
def risk_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return (
        o.select(
            F.when(p <= 50000, "Low")
            .when(p <= 150000, "Medium")
            .when(p <= 300000, "High")
            .otherwise("Severe")
            .alias("risk_level")
        )
        .groupBy("risk_level")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "retention_filter",
    ops=("S11", "P3", "F6"),
    doc="Retention cutoff delete re-expressed as a filter, with 'now' "
    "frozen for determinism (ref `ml_pipeline_dag.py:506-507`; "
    "SURVEY §7 nondeterminism trap).",
    oracle="""
SELECT event_type, COUNT(*) AS n_events
FROM events
WHERE make_timestamp(epoch_ns(ts) // 1000)
      >= TIMESTAMP '2024-01-31 00:00:00' - INTERVAL 14 DAY
GROUP BY 1
""",
)
def retention_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    now = F.lit("2024-01-31 00:00:00").cast("timestamp")
    return (
        e.filter(F.col("event_time") >= now - F.expr("interval 14 days"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "set_ops_suite",
    ops=("U1",),
    doc="Set operations beyond the reference's UNION ALL: customers "
    "with urgent orders INTERSECT customers with high-priority orders, "
    "and EXCEPT for urgent-only — distinct-set semantics on both "
    "engines. Spark plans these as aggregated semi/anti joins.",
    oracle="""
WITH urgent AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
), high AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
)
SELECT 'both' AS segment, COUNT(*) AS n_customers
FROM (SELECT o_custkey FROM urgent INTERSECT SELECT o_custkey FROM high)
UNION ALL
SELECT 'urgent_only', COUNT(*)
FROM (SELECT o_custkey FROM urgent EXCEPT SELECT o_custkey FROM high)
""",
)
def set_ops_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey").distinct()
    high = o.filter(F.col("o_orderpriority") == "2-HIGH").select("o_custkey").distinct()
    both = urgent.intersect(high).agg(F.count(F.lit(1)).alias("n_customers")).select(
        F.lit("both").alias("segment"), "n_customers"
    )
    only = urgent.exceptAll(high).agg(F.count(F.lit(1)).alias("n_customers")).select(
        F.lit("urgent_only").alias("segment"), "n_customers"
    )
    return both.unionByName(only)


@register(
    "window_value_suite",
    ops=("W1", "W12"),
    doc="Window value functions with explicit frames: first_value over "
    "the default frame, last_value over the FULL partition (the "
    "classic trap — the default frame ends at CURRENT ROW, so "
    "last_value needs UNBOUNDED FOLLOWING), and nth_value(2).",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
  first_value(o_totalprice) OVER w AS first_price,
  last_value(o_totalprice) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
  nth_value(o_totalprice, 2) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def window_value_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.first("o_totalprice").over(base).alias("first_price"),
        F.last("o_totalprice").over(full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(full).alias("second_price"),
    )


@register(
    "argmax_per_group",
    ops=("A3", "J3"),
    doc="ARG_MAX/ARG_MIN per group via max_by/min_by over a (value, "
    "tiebreak-key) struct — a single hash aggregate with map-side "
    "combine instead of the window row_number=1 pattern (no "
    "partition sort, no shuffle of losing rows past the combiner). "
    "The struct key makes ties deterministic: c_custkey is unique. "
    "The oracle spells out the portable row_number emulation.",
    oracle="""
WITH ranked AS (
  SELECT n_name, c_name, c_custkey, c_acctbal,
    ROW_NUMBER() OVER (PARTITION BY n_name
                       ORDER BY c_acctbal DESC, c_custkey DESC) AS rmax,
    ROW_NUMBER() OVER (PARTITION BY n_name
                       ORDER BY c_acctbal ASC, c_custkey ASC) AS rmin
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)
SELECT n_name,
       COUNT(*) AS n_customers,
       MAX(CASE WHEN rmax = 1 THEN c_name END) AS top_cust_name,
       MAX(CASE WHEN rmax = 1 THEN c_acctbal END) AS top_acctbal,
       MAX(CASE WHEN rmin = 1 THEN c_name END) AS bottom_cust_name,
       MAX(CASE WHEN rmin = 1 THEN c_acctbal END) AS bottom_acctbal
FROM ranked
GROUP BY n_name
""",
)
def argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    key = F.struct(F.col("c_acctbal"), F.col("c_custkey"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.max_by("c_name", key).alias("top_cust_name"),
            F.max_by("c_acctbal", key).alias("top_acctbal"),
            F.min_by("c_name", key).alias("bottom_cust_name"),
            F.min_by("c_acctbal", key).alias("bottom_acctbal"),
        )
    )


@register(
    "array_agg_suite",
    ops=("A1", "F10"),
    doc="Collection aggregation: per-order sorted part-key array plus "
    "array accessors (element_at is 1-indexed in both engines) and a "
    "distinct-cardinality derived from the array — the nested-type "
    "surface a feature store needs for list-valued features. "
    "collect_list order is nondeterministic on a cluster; array_sort "
    "makes the result partition-order-independent. The array itself "
    "is emitted as a canonical CSV string — the driver hash compares "
    "scalar cells, so the nested value crosses engines as text.",
    oracle="""
SELECT l_orderkey,
       array_to_string(list_sort(list(l_partkey)), ',') AS part_keys_csv,
       CAST(len(list(l_partkey)) AS BIGINT) AS n_items,
       list_sort(list(l_partkey))[1] AS first_part,
       list_sort(list(l_partkey))[-1] AS last_part,
       CAST(len(list_distinct(list(l_partkey))) AS BIGINT) AS n_distinct_parts
FROM lineitem
GROUP BY l_orderkey
""",
)
def array_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    parts = F.array_sort(F.collect_list("l_partkey"))
    return l.groupBy("l_orderkey").agg(
        F.array_join(parts, ",").alias("part_keys_csv"),
        F.size(parts).cast("bigint").alias("n_items"),
        F.element_at(parts, 1).alias("first_part"),
        F.element_at(parts, -1).alias("last_part"),
        # distinct-from-the-array: avoids the separate COUNT(DISTINCT)
        # expand+reshuffle — one hash aggregate instead of two.
        F.size(F.array_distinct(parts)).cast("bigint").alias("n_distinct_parts"),
    )


@register(
    "corr_features",
    ops=("A3", "A9"),
    doc="Pearson correlation per group from exact decimal sufficient "
    "statistics (n, Sx, Sy, Sxy, Sxx, Syy in one aggregate pass — "
    "the mergeable-moments form, so partials combine map-side like "
    "any sum): quantity-vs-price correlation per return flag. "
    "Built-in corr() is order-dependent float summation; this is "
    "the bitwise-deterministic twin, same recipe as dstddev.",
    oracle=f"""
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       {N.sql_dcorr("l_quantity", "l_extendedprice")} AS corr_qty_price,
       {N.sql_dcorr("l_quantity", "l_discount")} AS corr_qty_discount
FROM lineitem
GROUP BY l_returnflag
""",
)
def corr_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        N.dcorr("l_quantity", "l_extendedprice").alias("corr_qty_price"),
        N.dcorr("l_quantity", "l_discount").alias("corr_qty_discount"),
    )


@register(
    "unpivot_melt",
    ops=("A3", "P1"),
    doc="Unpivot/melt: the per-priority wide metrics row (n_orders, "
    "revenue, max_price) turned long via DataFrame.unpivot — the "
    "narrow dual of pivot_status_matrix; the oracle spells the "
    "portable UNION ALL compilation. The melt runs on the aggregate "
    "(5 rows), so the explode factor is metric-count, not data.",
    oracle=f"""
WITH wide AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS DOUBLE) AS n_orders,
         {N.sql_dsum("o_totalprice")} AS revenue,
         CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
  FROM orders GROUP BY 1
)
SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS metric_value FROM wide
UNION ALL
SELECT o_orderpriority, 'revenue', revenue FROM wide
UNION ALL
SELECT o_orderpriority, 'max_price', max_price FROM wide
""",
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        N.dsum("o_totalprice").alias("revenue"),
        F.max("o_totalprice").cast("double").alias("max_price"),
    )
    return wide.unpivot(
        ["o_orderpriority"],
        ["n_orders", "revenue", "max_price"],
        "metric",
        "metric_value",
    )


@register(
    "null_safe_join",
    ops=("J1", "P6"),
    doc="Null-safe equality join (<=> / IS NOT DISTINCT FROM): order "
    "status is bucketed with 'P' mapped to NULL, then joined against "
    "a 3-row label dim whose key includes NULL — plain equality "
    "would silently drop the NULL bucket (NULL = NULL is NULL); the "
    "null-safe operator keeps it a hash-joinable equi-key.",
    oracle=f"""
WITH bucketed AS (
  SELECT NULLIF(o_orderstatus, 'P') AS status_key, o_totalprice FROM orders
),
dim AS (
  SELECT * FROM (VALUES ('F', 'finished'), ('O', 'open'),
                        (CAST(NULL AS VARCHAR), 'pending-or-unknown'))
    AS t(status_key, status_label)
)
SELECT d.status_label,
       COUNT(*) AS n_orders,
       {N.sql_dsum("b.o_totalprice")} AS revenue
FROM bucketed b JOIN dim d ON b.status_key IS NOT DISTINCT FROM d.status_key
GROUP BY d.status_label
""",
)
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_key"),
        "o_totalprice",
    )
    dim = spark.createDataFrame(
        [("F", "finished"), ("O", "open"), (None, "pending-or-unknown")],
        "status_key string, status_label string",
    )
    return (
        o.join(F.broadcast(dim), o.status_key.eqNullSafe(dim.status_key))
        .groupBy("status_label")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            N.dsum("o_totalprice").alias("revenue"),
        )
    )


@register(
    "weighted_percentiles",
    ops=("A8", "W11", "A3"),
    doc="Exact weighted percentiles (median and quartiles of extended "
    "price weighted by quantity, per return flag): aggregate equal "
    "values first, cumulative weight by one value-ordered window, "
    "then the smallest value whose cumulative weight reaches q*W. "
    "Unlike percentile interpolation this is pure comparisons on "
    "data values — no float arithmetic on the quantile itself — and "
    "the value-level pre-aggregate bounds the window at distinct "
    "values, not rows.",
    oracle=f"""
WITH vw AS (
  SELECT l_returnflag AS flag, l_extendedprice AS v,
    {N.sql_dsum("l_quantity")} AS w
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT flag, v, w,
    CAST(SUM(CAST(w AS DECIMAL(18,4))) OVER (PARTITION BY flag ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cw,
    CAST(SUM(CAST(w AS DECIMAL(18,4))) OVER (PARTITION BY flag) AS DOUBLE) AS tw
  FROM vw
)
SELECT flag, MAX(tw) AS total_weight,
  MIN(CASE WHEN cw >= 0.25 * tw THEN v END) AS w_p25,
  MIN(CASE WHEN cw >= 0.50 * tw THEN v END) AS w_median,
  MIN(CASE WHEN cw >= 0.75 * tw THEN v END) AS w_p75
FROM cum GROUP BY flag
""",
)
def weighted_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    vw = (
        l.groupBy(
            F.col("l_returnflag").alias("flag"),
            F.col("l_extendedprice").alias("v"),
        )
        .agg(N.dsum("l_quantity").alias("w"))
    )
    cw_w = (
        Window.partitionBy("flag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = vw.select(
        "flag",
        "v",
        "w",
        F.sum(F.col("w").cast(N.DEC)).over(cw_w).cast("double").alias("cw"),
        F.sum(F.col("w").cast(N.DEC))
        .over(Window.partitionBy("flag"))
        .cast("double")
        .alias("tw"),
    )
    return cum.groupBy("flag").agg(
        F.max("tw").alias("total_weight"),
        F.min(F.when(F.col("cw") >= 0.25 * F.col("tw"), F.col("v"))).alias("w_p25"),
        F.min(F.when(F.col("cw") >= 0.50 * F.col("tw"), F.col("v"))).alias("w_median"),
        F.min(F.when(F.col("cw") >= 0.75 * F.col("tw"), F.col("v"))).alias("w_p75"),
    )


@register(
    "pareto_frontier",
    ops=("W12", "A3", "J6"),
    doc="Pareto frontier (skyline) over per-customer (total spend, "
    "order count): a customer is dominated when another is ≥ on both "
    "axes and strictly > on one. Computed with two windows over the "
    "customer AGGREGATE (not the fact table): max(orders) over the "
    "strictly-greater-spend RANGE frame, and max(orders) within the "
    "equal-spend partition — no pairwise self-join, O(n log n) where "
    "n = customers. Spend is exact integer cents so the RANGE frame "
    "boundary (spend + 1) is well-defined and cross-engine identical. "
    "The multi-objective top-k the reference approximates with two "
    "separate ORDER BY LIMIT lists (`sql/analysis_queries.sql`).",
    oracle="""
WITH cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
           AS spend_cents,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1
),
m AS (
  SELECT *,
    MAX(n_orders) OVER (ORDER BY spend_cents DESC
                        RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      AS best_orders_richer,
    MAX(n_orders) OVER (PARTITION BY spend_cents) AS best_orders_equal
  FROM cust
)
SELECT o_custkey, spend_cents, CAST(n_orders AS BIGINT) AS n_orders
FROM m
WHERE (best_orders_richer IS NULL OR best_orders_richer < n_orders)
  AND best_orders_equal = n_orders
""",
)
def pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")

    # Pinned (r10): the per-customer spend frame feeds the per-spend
    # rollup AND the join-back — without the pin the orders-scale
    # groupBy executed twice.
    cust = _pin(
        o.groupBy("o_custkey").agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("spend_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    # "Best among strictly richer" = exclusive running MAX over the
    # per-distinct-spend aggregate (RANGE frame ≡ ROWS frame once
    # values are distinct), computed with the distributed two-phase
    # rank's cum_max_excl and joined back — the customer frame is
    # entity-scaled, so no single-partition window.
    per_spend = cust.groupBy("spend_cents").agg(
        F.max("n_orders").alias("best_orders_equal")
    )
    richer = two_phase_rank(
        per_spend,
        (F.col("spend_cents").desc(),),
        cum_max_excl={"best_orders_richer": F.col("best_orders_equal")},
    ).select("spend_cents", "best_orders_richer", "best_orders_equal")
    m = cust.join(richer, "spend_cents").select(
        "o_custkey",
        "spend_cents",
        "n_orders",
        "best_orders_richer",
        "best_orders_equal",
    )
    return m.filter(
        (
            F.col("best_orders_richer").isNull()
            | (F.col("best_orders_richer") < F.col("n_orders"))
        )
        & (F.col("best_orders_equal") == F.col("n_orders"))
    ).select("o_custkey", "spend_cents", F.col("n_orders").cast("long").alias("n_orders"))


@register(
    "percentile_disc_suite",
    ops=("A8", "W4", "W13"),
    doc="Exact DISCRETE percentiles (the value actually present in "
    "the data, vs percentile_cont's interpolation): per order-status "
    "group, the p25/p50/p75 member selected by the explicit index "
    "rule rn == ceil(q·n) over a (value, key)-ordered window — no "
    "per-group array materialization, so group size is unbounded at "
    "100 TB (the window sort is the same shuffle the groupBy needs).",
    oracle="""
WITH ranked AS (
  SELECT o_orderstatus AS status, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                       ORDER BY o_totalprice, o_orderkey) AS rn,
    COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM orders
)
SELECT status,
  MAX(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN o_totalprice END) AS p25_disc,
  MAX(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN o_totalprice END) AS p50_disc,
  MAX(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN o_totalprice END) AS p75_disc,
  CAST(MAX(n) AS BIGINT) AS n_rows
FROM ranked
GROUP BY 1
""",
)
def percentile_disc_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders", spread=True)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    ranked = o.select(
        F.col("o_orderstatus").alias("status"),
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("o_orderstatus"))
        .alias("n"),
    )

    def pick(q: float):
        return F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(q) * F.col("n")).cast("bigint"),
                F.col("o_totalprice"),
            )
        )

    return ranked.groupBy("status").agg(
        pick(0.25).alias("p25_disc"),
        pick(0.50).alias("p50_disc"),
        pick(0.75).alias("p75_disc"),
        F.max("n").cast("bigint").alias("n_rows"),
    )


@register(
    "agg_builtins_suite",
    ops=("A3", "A5", "A6", "A8", "A12"),
    doc="Modern aggregate-builtin coverage in one grouped pass: "
    "every/some (universal + existential quantifiers), count_if, "
    "exact median (interpolating, = percentile 0.5), and the "
    "bitwise aggregate family bit_and/bit_or/bit_xor over the key "
    "column (order-insensitive integer folds — partition-merge "
    "safe by construction, and the xor doubles as a cheap content "
    "checksum for reconciliation). Everything is one hash "
    "aggregate with map-side partials; no expression leaves "
    "codegen.",
    oracle="""
SELECT o_orderstatus,
  bool_and(o_totalprice > 0) AS all_positive,
  bool_or(o_orderkey % 2 = 0) AS any_even_key,
  CAST(count_if(o_totalprice > 100000.0) AS BIGINT) AS n_big,
  median(o_totalprice) AS median_price,
  CAST(bit_and(o_orderkey) AS BIGINT) AS key_bit_and,
  CAST(bit_or(o_orderkey) AS BIGINT) AS key_bit_or,
  CAST(bit_xor(o_orderkey) AS BIGINT) AS key_bit_xor
FROM orders
GROUP BY 1
""",
)
def agg_builtins_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.every(F.col("o_totalprice") > 0).alias("all_positive"),
        F.some((F.col("o_orderkey") % 2) == 0).alias("any_even_key"),
        F.count_if(F.col("o_totalprice") > 100000.0)
        .cast("bigint")
        .alias("n_big"),
        F.median("o_totalprice").alias("median_price"),
        F.bit_and("o_orderkey").cast("bigint").alias("key_bit_and"),
        F.bit_or("o_orderkey").cast("bigint").alias("key_bit_or"),
        F.bit_xor("o_orderkey").cast("bigint").alias("key_bit_xor"),
    )


#: Top-k prices folded into per-group arrays for the lambda suite —
#: small, explicitly ordered, so double arithmetic inside the fold is
#: order-pinned on both engines.
_HOF_TOPK = 8


@register(
    "higher_order_lambda_suite",
    ops=("F10", "A3", "W4", "P7"),
    doc="Higher-order array-function coverage on an order-pinned "
    "array: each status's top-8 prices (rank-picked, descending — "
    "the array ORDER is part of the contract, so the fold below is "
    "deterministic) run through transform (10% haircut), filter "
    "(six figures), exists/forall quantifiers, aggregate (left "
    "fold sum — sequential, NOT a shuffle reduce, so double "
    "addition order is pinned), and zip_with against the reversed "
    "array (min of head/tail pairs). All lambdas execute inside "
    "codegen — the array family is the UDF-free escape hatch for "
    "per-row collection logic.",
    oracle=f"""
WITH ranked AS (
  SELECT o_orderstatus, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
),
arrs AS (
  SELECT o_orderstatus,
    list(o_totalprice ORDER BY rk) AS prices
  FROM ranked WHERE rk <= {_HOF_TOPK}
  GROUP BY 1
)
SELECT o_orderstatus,
  len(prices) AS n,
  array_to_string(list_transform(prices,
      x -> CAST(CAST(round(x * 0.9, 2) AS DECIMAL(18,2)) AS VARCHAR)),
      ',') AS haircut,
  len(list_filter(prices, x -> x >= 100000.0)) AS n_six_figs,
  len(list_filter(prices, x -> x >= 500000.0)) > 0 AS any_half_million,
  len(list_filter(prices, x -> x > 0.0)) = len(prices) AS all_positive,
  list_reduce(list_prepend(0.0, prices), (acc, x) -> acc + x) AS fold_sum,
  list_zip(prices, list_reverse(prices)) IS NOT NULL AS zipped_ok,
  array_to_string(list_transform(list_zip(prices, list_reverse(prices)),
      p -> CAST(CAST(LEAST(p[1], p[2]) AS DECIMAL(18,2)) AS VARCHAR)),
      ',') AS head_tail_min
FROM arrs
""",
)
def higher_order_lambda_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    rk = F.row_number().over(
        Window.partitionBy("o_orderstatus").orderBy(
            F.col("o_totalprice").desc(), "o_orderkey"
        )
    )
    arrs = (
        o.withColumn("rk", rk)
        .filter(F.col("rk") <= _HOF_TOPK)
        .groupBy("o_orderstatus")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("rk", "o_totalprice"))
            ).alias("pairs")
        )
        .select(
            "o_orderstatus",
            F.expr("transform(pairs, p -> p.o_totalprice)").alias("prices"),
        )
    )
    return arrs.select(
        "o_orderstatus",
        F.size("prices").cast("bigint").alias("n"),
        # Arrays are serialized to fixed-decimal CSV strings (here and in
        # the oracle): the driver's canonicalizer sorts/hashes pandas
        # cells and dies on ndarray cells, so every output cell must be
        # scalar. Prices are exact 2-decimal doubles, making the
        # DECIMAL(18,2) rendering exact on both engines.
        F.array_join(
            F.expr(
                "transform(prices, x -> "
                "cast(cast(round(x * 0.9, 2) as decimal(18,2)) as string))"
            ),
            ",",
        ).alias("haircut"),
        F.size(F.expr("filter(prices, x -> x >= 100000.0D)"))
        .cast("bigint")
        .alias("n_six_figs"),
        F.expr("exists(prices, x -> x >= 500000.0D)").alias(
            "any_half_million"
        ),
        F.expr("forall(prices, x -> x > 0.0D)").alias("all_positive"),
        F.expr("aggregate(prices, 0.0D, (acc, x) -> acc + x)").alias(
            "fold_sum"
        ),
        F.expr("zip_with(prices, reverse(prices), (a, b) -> a) IS NOT NULL").alias(
            "zipped_ok"
        ),
        F.array_join(
            F.expr(
                "zip_with(prices, reverse(prices), (a, b) -> "
                "cast(cast(least(a, b) as decimal(18,2)) as string))"
            ),
            ",",
        ).alias("head_tail_min"),
    )


@register(
    "lateral_topk_per_group",
    ops=("J6", "O1", "O4", "J3"),
    doc="Correlated LATERAL subquery top-N: for every nation, the "
    "top-3 customers by account balance via a per-row correlated "
    "derived table (the SQL-standard spelling of top-N-per-group; "
    "topk_orders/rank_suite carry the window spelling). Catalyst "
    "decorrelates the LATERAL into a ranked join — same plan class "
    "as the window version, proven by the oracle hash. Full "
    "tiebreakers make the row set unique.",
    oracle="""
SELECT n.n_name, t.c_custkey, t.c_acctbal
FROM nation n, LATERAL (
  SELECT c_custkey, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 3
) t
""",
)
def lateral_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "nation").createOrReplaceTempView("tdps_lat_nation")
    table(spark, sf_dir, "customer").createOrReplaceTempView(
        "tdps_lat_customer"
    )
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM tdps_lat_nation n, LATERAL (
          SELECT c_custkey, c_acctbal FROM tdps_lat_customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey
          LIMIT 3
        ) t
        """
    )


@register(
    "dataframe_transpose_report",
    ops=("P1", "A3", "U1"),
    doc="DataFrame.transpose (Spark 4): the per-status KPI aggregate "
    "(3 rows × k metrics) is flipped into a metric-per-row report "
    "(k rows × 3 status columns) — the presentation-layer pivot "
    "dashboards want, done engine-side. Transpose collects the "
    "FRAME WIDTH from the data, so it is only sane on aggregate-"
    "sized inputs (documented; the input here is 3 rows). Metrics "
    "are decimal-exact; the DuckDB twin builds the same report by "
    "conditional aggregation.",
    oracle="""
WITH agg AS (
  SELECT o_orderstatus,
    CAST(COUNT(*) AS DOUBLE) AS n_orders,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
    CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) AS n_customers
  FROM orders GROUP BY 1
)
SELECT 'n_orders' AS key,
  MAX(CASE WHEN o_orderstatus = 'F' THEN n_orders END) AS F,
  MAX(CASE WHEN o_orderstatus = 'O' THEN n_orders END) AS O,
  MAX(CASE WHEN o_orderstatus = 'P' THEN n_orders END) AS P
FROM agg
UNION ALL
SELECT 'revenue',
  MAX(CASE WHEN o_orderstatus = 'F' THEN revenue END),
  MAX(CASE WHEN o_orderstatus = 'O' THEN revenue END),
  MAX(CASE WHEN o_orderstatus = 'P' THEN revenue END)
FROM agg
UNION ALL
SELECT 'n_customers',
  MAX(CASE WHEN o_orderstatus = 'F' THEN n_customers END),
  MAX(CASE WHEN o_orderstatus = 'O' THEN n_customers END),
  MAX(CASE WHEN o_orderstatus = 'P' THEN n_customers END)
FROM agg
""",
)
def dataframe_transpose_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(N.DEC))
        .cast("double")
        .alias("revenue"),
        F.countDistinct("o_custkey").cast("double").alias("n_customers"),
    )
    return agg.transpose("o_orderstatus")


@register(
    "date_functions_suite",
    ops=("F1", "F5", "F6", "F7"),
    doc="Calendar builtin breadth over order dates: add_months, "
    "last_day, quarter, dayofyear, ISO next-Monday (Spark next_day; "
    "the twin derives it from DOW arithmetic since DuckDB lacks the "
    "builtin — same calendar answer), and quarter-truncation. "
    "Grouped per month so the hash certifies every row's calendar "
    "math across both engines' date kernels.",
    oracle="""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS od FROM orders
),
t AS (
  SELECT od,
    CAST(od + INTERVAL 3 MONTH AS DATE) AS plus3m,
    last_day(od) AS month_end,
    quarter(od) AS q,
    dayofyear(od) AS doy,
    CAST(od + CAST((8 - isodow(od)) % 7 AS INTEGER)
            + CASE WHEN isodow(od) = 1 THEN 7 ELSE 0 END AS DATE)
      AS next_monday,
    CAST(date_trunc('quarter', od) AS DATE) AS q_start
  FROM d
)
SELECT strftime(CAST(date_trunc('month', od) AS DATE), '%Y-%m-%d') AS month,
  COUNT(*) AS n,
  CAST(MIN(plus3m) AS TIMESTAMP) AS min_plus3m,
  CAST(MAX(month_end) AS TIMESTAMP) AS max_month_end,
  CAST(SUM(q) AS BIGINT) AS sum_quarter,
  CAST(SUM(doy) AS BIGINT) AS sum_doy,
  CAST(MIN(next_monday) AS TIMESTAMP) AS min_next_monday,
  CAST(MIN(q_start) AS TIMESTAMP) AS min_q_start
FROM t
GROUP BY 1
""",
)
def date_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    od = F.to_date("o_orderdate")
    t = o.select(
        od.alias("od"),
        F.add_months(od, 3).alias("plus3m"),
        F.last_day(od).alias("month_end"),
        F.quarter(od).alias("q"),
        F.dayofyear(od).alias("doy"),
        F.next_day(od, "Monday").alias("next_monday"),
        F.date_trunc("quarter", od).cast("date").alias("q_start"),
    )
    return t.groupBy(
        F.date_format(F.date_trunc("month", F.col("od")), "yyyy-MM-dd").alias(
            "month"
        )
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("plus3m").cast("timestamp").alias("min_plus3m"),
        F.max("month_end").cast("timestamp").alias("max_month_end"),
        F.sum("q").cast("bigint").alias("sum_quarter"),
        F.sum("doy").cast("bigint").alias("sum_doy"),
        F.min("next_monday").cast("timestamp").alias("min_next_monday"),
        F.min("q_start").cast("timestamp").alias("min_q_start"),
    )


@register(
    "map_functions_suite",
    ops=("F10", "P9", "A1"),
    doc="Map-type function family: per-order attributes packed into a "
    "MAP via str_to_map, filtered with the map_filter lambda, "
    "augmented by map_concat, then exploded back to key/value rows "
    "and aggregated — the schema-on-read attribute-bag pattern "
    "(entity-attribute-value feeds). The exploded-rows output "
    "keeps MAP out of the compared schema (engines' map wire "
    "formats differ); the DuckDB twin builds the same rows by "
    "UNION. All codegen, one scan.",
    oracle="""
WITH kv AS (
  SELECT 'status' AS k, o_orderstatus AS v FROM orders
  UNION ALL
  SELECT 'prio', o_orderpriority FROM orders
  UNION ALL
  SELECT 'bigticket', CASE WHEN o_totalprice > 300000.0
                           THEN 'yes' ELSE 'no' END
  FROM orders
)
SELECT k, v, COUNT(*) AS n
FROM kv
GROUP BY 1, 2
""",
)
def map_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    m = F.expr(
        "map_concat("
        "  map_filter("
        "    str_to_map(concat('status:', o_orderstatus,"
        "                      ',prio:', o_orderpriority), ',', ':'),"
        "    (k, v) -> v IS NOT NULL),"
        "  map('bigticket', CASE WHEN o_totalprice > 300000.0D"
        "                        THEN 'yes' ELSE 'no' END))"
    )
    return (
        o.select(F.explode(m).alias("k", "v"))
        .groupBy("k", "v")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "string_agg_ordered",
    ops=("A3", "W4", "O3"),
    doc="Ordered string aggregation (Spark 4 LISTAGG ... WITHIN GROUP, "
    "the SQL:2016 standard spelling): each nation's top-5 customer "
    "keys concatenated in balance order — deterministic because the "
    "WITHIN GROUP order is total (balance desc, key). The "
    "report-feed primitive that otherwise needs "
    "collect_list+array_join+sort; DuckDB's twin is string_agg "
    "with ORDER BY.",
    oracle="""
WITH top5 AS (
  SELECT c_nationkey, c_custkey, c_acctbal
  FROM (
    SELECT c_nationkey, c_custkey, c_acctbal,
      ROW_NUMBER() OVER (PARTITION BY c_nationkey
                         ORDER BY c_acctbal DESC, c_custkey) AS rk
    FROM customer
  ) WHERE rk <= 5
)
SELECT c_nationkey,
  COUNT(*) AS n,
  string_agg(CAST(c_custkey AS VARCHAR), ','
             ORDER BY c_acctbal DESC, c_custkey) AS top_keys
FROM top5
GROUP BY 1
""",
)
def string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "customer").createOrReplaceTempView(
        "tdps_agg_customer"
    )
    return spark.sql(
        """
        WITH top5 AS (
          SELECT c_nationkey, c_custkey, c_acctbal
          FROM (
            SELECT c_nationkey, c_custkey, c_acctbal,
              ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                 ORDER BY c_acctbal DESC, c_custkey) AS rk
            FROM tdps_agg_customer
          ) WHERE rk <= 5
        )
        SELECT c_nationkey,
          COUNT(*) AS n,
          listagg(CAST(c_custkey AS STRING), ',')
            WITHIN GROUP (ORDER BY c_acctbal DESC, c_custkey) AS top_keys
        FROM top5
        GROUP BY c_nationkey
        """
    )


@register(
    "try_functions_suite",
    ops=("P8", "P9", "A1", "P5"),
    doc="Error-safe expression family (try_divide / try_cast / "
    "try_add / try_to_timestamp): malformed casts, zero divisors, "
    "and int64 overflow yield NULL instead of failing the job — "
    "the quarantine-not-crash semantics a 100 TB load needs (one "
    "poison row must not kill a 6-hour job). Exercised on "
    "synthetic poison derived from order rows; the twin spells "
    "the same semantics with TRY_CAST/NULLIF guards. Counts of "
    "each NULL class certify the behavior row-for-row.",
    oracle="""
WITH t AS (
  SELECT
    CAST(o_totalprice AS DOUBLE)
      / NULLIF(CAST(o_orderkey % 3 AS DOUBLE), 0.0) AS safe_div,
    TRY_CAST(CASE WHEN o_orderkey % 5 = 0 THEN 'oops'
                  ELSE CAST(o_orderkey AS VARCHAR) END AS BIGINT) AS cast_k,
    CASE WHEN o_orderkey % 7 = 0 THEN NULL
         ELSE o_orderkey + 1 END AS add_guarded,
    TRY_CAST(CASE WHEN o_orderkey % 2 = 0 THEN 'not a time'
                  ELSE '2024-01-15 12:00:00' END AS TIMESTAMP) AS ts
  FROM orders
)
SELECT
  COUNT(*) AS n_rows,
  CAST(SUM(CASE WHEN safe_div IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_div_null,
  CAST(SUM(CASE WHEN cast_k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_cast_null,
  CAST(SUM(CASE WHEN add_guarded IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_add_null,
  CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_ts_null,
  CAST(SUM(CAST(cast_k AS DECIMAL(18,0))) AS BIGINT) AS sum_cast_ok
FROM t
""",
)
def try_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    t = o.select(
        F.expr(
            "try_divide(CAST(o_totalprice AS DOUBLE),"
            " CAST(o_orderkey % 3 AS DOUBLE))"
        ).alias("safe_div"),
        F.expr(
            "try_cast(CASE WHEN o_orderkey % 5 = 0 THEN 'oops'"
            " ELSE CAST(o_orderkey AS STRING) END AS BIGINT)"
        ).alias("cast_k"),
        # try_add overflow needs max-int64 operands; the oracle-shared
        # semantics here use a poison-NULL branch (DuckDB has no
        # try_add), with overflow itself covered by the property test.
        F.expr(
            "CASE WHEN o_orderkey % 7 = 0 THEN try_add(9223372036854775807L, 1L)"
            " ELSE try_add(o_orderkey, 1L) END"
        ).alias("add_guarded"),
        F.expr(
            "try_to_timestamp(CASE WHEN o_orderkey % 2 = 0 THEN 'not a time'"
            " ELSE '2024-01-15 12:00:00' END)"
        ).alias("ts"),
    )
    return t.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("safe_div").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_div_null"),
        F.sum(F.when(F.col("cast_k").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_cast_null"),
        F.sum(F.when(F.col("add_guarded").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_add_null"),
        F.sum(F.when(F.col("ts").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_ts_null"),
        F.sum(F.col("cast_k").cast("decimal(18,0)"))
        .cast("bigint")
        .alias("sum_cast_ok"),
    )


@register(
    "abc_customer_classification",
    ops=("W11", "W4", "P5", "A3"),
    doc="ABC / Pareto classification of customers by revenue: rank by "
    "decimal-exact customer revenue, cumulative share over the "
    "ranked frame, class A up to 80% of revenue, B to 95%, C the "
    "tail — the inventory/CRM segmentation standard, composed from "
    "the cumulative-share primitive. Class boundaries compare "
    "cumulative EXACT decimal sums against 0.80/0.95 of the exact "
    "total (one double division each), so the class of every "
    "customer is cross-engine stable. Reports per-class size and "
    "revenue share. The cumulative share runs as the distributed "
    "two-phase range rank (functions/ranking.two_phase_rank — "
    "range-partition, local running sum, broadcast prefix offsets), "
    "never a single-partition window; the aggregate is customer-"
    "bounded.",
    oracle="""
WITH per AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT o_custkey, rev,
    SUM(rev) OVER (ORDER BY rev DESC, o_custkey) AS cum_rev,
    SUM(rev) OVER () AS total_rev
  FROM per
),
classed AS (
  SELECT *,
    CASE WHEN CAST(cum_rev AS DOUBLE) / CAST(total_rev AS DOUBLE) <= 0.80
         THEN 'A'
         WHEN CAST(cum_rev AS DOUBLE) / CAST(total_rev AS DOUBLE) <= 0.95
         THEN 'B'
         ELSE 'C' END AS abc_class
  FROM ranked
)
SELECT abc_class,
  COUNT(*) AS n_customers,
  CAST(SUM(rev) AS DOUBLE) AS class_revenue,
  CAST(SUM(rev) AS DOUBLE) / CAST(MAX(total_rev) AS DOUBLE)
    AS revenue_share
FROM classed
GROUP BY 1
""",
)
def abc_customer_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(N.DEC)).alias("rev")
    )
    # Distributed two-phase cumulative share — (rev desc, custkey) is a
    # TOTAL order, so the range-partitioned running sum is bitwise equal
    # to the serial window (functions/ranking.py); the per-customer
    # frame is entity-scaled, so a single-partition window would not
    # survive 100×.
    ranked = two_phase_rank(
        per,
        (F.col("rev").desc(), F.col("o_custkey")),
        cum={"cum_rev": F.col("rev")},
        totals={"total_rev": F.col("rev")},
    )
    share = F.col("cum_rev").cast("double") / F.col("total_rev").cast("double")
    classed = ranked.select(
        "rev",
        "total_rev",
        F.when(share <= 0.80, "A")
        .when(share <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("rev").cast("double").alias("class_revenue"),
        (
            F.sum("rev").cast("double")
            / F.max("total_rev").cast("double")
        ).alias("revenue_share"),
    )
