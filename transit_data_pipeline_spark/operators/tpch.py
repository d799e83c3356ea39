"""Canonical TPC-H queries over the driver tables — the
industry-standard decision-support suite, re-expressed Spark-first
with the engine's deterministic-aggregate discipline (decimal-exact
sums, rounded ratios, full tiebreakers). The fixtures carry a subset
of the TPC-H columns, so Q3 substitutes o_orderpriority for the
absent o_shippriority; everything else follows the spec shapes
(TPC-H v3 specification, tpc.org — public domain benchmark text).

Scale notes: Q1/Q6 are single-scan aggregates (predicate pushdown to
parquet, map-side partials); Q3/Q10 are fact-fact joins keyed on
orderkey with dimension filters applied BEFORE the join; Q5 is the
classic star with region/nation broadcast and the s_nationkey =
c_nationkey colocation condition evaluated inside the join. Top-k
tails are sort+limit, never global windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import numeric as N
from .registry import register


@register(
    "tpch_q1_pricing_summary",
    ops=("A3", "A5", "P3", "F5"),
    doc="TPC-H Q1 pricing summary report: per (returnflag, "
    "linestatus) sums of quantity / price / discounted price / "
    "discounted+taxed price, averages, and row counts over lineitem "
    "shipped on or before the cutoff. Every sum runs through exact "
    "DECIMAL; the derived products disc_price and charge are "
    "computed IN decimal before summing, so the whole report is "
    "bitwise reproducible on any partition layout. One scan, one "
    "hash aggregate over ~6 groups — the canonical map-side-partial "
    "workload.",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
  {N.sql_dsum("l_quantity")} AS sum_qty,
  {N.sql_dsum("l_extendedprice")} AS sum_base_price,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))
       * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
    AS sum_disc_price,
  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(19,4))
       * CAST(1.0 - l_discount AS DECIMAL(18,4)) AS DECIMAL(25,8))
       * CAST(1.0 + l_tax AS DECIMAL(13,4))) AS VARCHAR) AS DOUBLE)
    AS sum_charge,
  ROUND({N.sql_davg("l_quantity")}, 4) AS avg_qty,
  ROUND({N.sql_davg("l_extendedprice")}, 4) AS avg_price,
  ROUND({N.sql_davg("l_discount")}, 4) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem", spread=True).filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    ep = F.col("l_extendedprice").cast("decimal(19,4)")
    disc_price = ep * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,4)")
    charge = disc_price.cast("decimal(25,8)") * (
        F.lit(1.0) + F.col("l_tax")
    ).cast("decimal(13,4)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        N.dsum("l_quantity").alias("sum_qty"),
        N.dsum("l_extendedprice").alias("sum_base_price"),
        F.sum(disc_price).cast("string").cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("string").cast("double").alias("sum_charge"),
        F.round(N.davg("l_quantity"), 4).alias("avg_qty"),
        F.round(N.davg("l_extendedprice"), 4).alias("avg_price"),
        F.round(N.davg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "tpch_q3_shipping_priority",
    ops=("J1", "J3", "A3", "O1", "P3"),
    doc="TPC-H Q3 shipping priority (adapted: o_orderpriority stands "
    "in for the fixture-absent o_shippriority): top-10 unshipped "
    "orders in the BUILDING segment by discounted revenue. Both "
    "dimension filters (mktsegment, order date) prune before the "
    "orderkey join; revenue sums in exact decimal; the tail is "
    "sort+limit with (revenue DESC, orderdate, orderkey) fully "
    "tiebroken.",
    oracle="""
SELECT l.l_orderkey,
  CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(19,4))
       * CAST(1.0 - l.l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
    AS revenue,
  strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
  o.o_orderpriority AS orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
LIMIT 10
""",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer", spread=True).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = table(spark, sf_dir, "orders", spread=True).filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem", spread=True).filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    rev = F.col("l_extendedprice").cast("decimal(19,4)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(18,4)")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
    )
    agg = joined.groupBy(
        "l_orderkey", "o_orderdate", "o_orderpriority"
    ).agg(F.sum(rev).cast("string").cast("double").alias("revenue"))
    return (
        agg.orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
    )


@register(
    "tpch_q5_local_supplier_volume",
    ops=("J3", "J4", "A3", "P3", "O3"),
    doc="TPC-H Q5 local supplier volume: revenue per nation within "
    "one region and year where the supplier and customer share a "
    "nation (the colocation equi-condition s_nationkey = "
    "c_nationkey rides inside the supplier join). region→nation "
    "prune first and broadcast; the two fact joins key on orderkey "
    "and (suppkey, nationkey); revenue in exact decimal; output "
    "sorted revenue DESC with the nation tiebreak.",
    oracle="""
SELECT n.n_name,
  CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(19,4))
       * CAST(1.0 - l.l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
    AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, n.n_name
""",
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer", spread=True)
    o = table(spark, sf_dir, "orders", spread=True).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem", spread=True)
    s = table(spark, sf_dir, "supplier", spread=True)
    n = table(spark, sf_dir, "nation", spread=True)
    r = table(spark, sf_dir, "region", spread=True).filter(
        F.col("r_name") == "ASIA"
    )
    nr = F.broadcast(
        n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    rev = F.col("l_extendedprice").cast("decimal(19,4)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(18,4)")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(s),
            (li["l_suppkey"] == s["s_suppkey"])
            & (s["s_nationkey"] == c["c_nationkey"]),
        )
        .join(nr, s["s_nationkey"] == nr["n_nationkey"])
    )
    return (
        joined.groupBy("n_name")
        .agg(F.sum(rev).cast("string").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "tpch_q6_revenue_change",
    ops=("A3", "P3", "P4"),
    doc="TPC-H Q6 forecasting revenue change: one filtered scan "
    "(shipdate year, discount band, quantity cap — all pushed to "
    "the parquet reader) and a single exact-decimal product sum. "
    "The purest predicate-pushdown benchmark in the suite.",
    oracle="""
SELECT
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))
       * CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
    AS revenue,
  COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def tpch_q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem", spread=True).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = F.col("l_extendedprice").cast("decimal(19,4)") * F.col(
        "l_discount"
    ).cast("decimal(18,4)")
    return li.agg(
        F.sum(rev).cast("string").cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "tpch_q10_returned_items",
    ops=("J1", "J3", "A3", "O1"),
    doc="TPC-H Q10 returned-item reporting: top-20 customers by "
    "revenue lost to returns in a quarter. The return flag and date "
    "window prune both fact sides before the orderkey join; the "
    "customer/nation dimensions broadcast; the tail is sort+limit "
    "with (revenue DESC, custkey) tiebreak.",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
  CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(19,4))
       * CAST(1.0 - l.l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
    AS revenue,
  ROUND(MAX(c.c_acctbal), 2) AS acctbal
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1995-10-01'
  AND o.o_orderdate < TIMESTAMP '1996-01-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer", spread=True)
    o = table(spark, sf_dir, "orders", spread=True).filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem", spread=True).filter(
        F.col("l_returnflag") == "R"
    )
    n = table(spark, sf_dir, "nation", spread=True)
    rev = F.col("l_extendedprice").cast("decimal(19,4)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(18,4)")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
    )
    agg = joined.groupBy("c_custkey", "c_name", "n_name").agg(
        F.sum(rev).cast("string").cast("double").alias("revenue"),
        F.round(F.max("c_acctbal"), 2).alias("acctbal"),
    )
    return (
        agg.orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "n_name", "revenue", "acctbal")
    )


#: Fixture stand-ins for Q7/Q8 parameters (synthetic nation names).
_Q7_NATION_A, _Q7_NATION_B = "NATION_1", "NATION_2"


@register(
    "tpch_q7_volume_shipping",
    ops=("J1", "J4", "A3", "P5", "F1"),
    doc="TPC-H Q7 volume shipping: bilateral trade revenue between "
    "two nations per year, where (supp_nation, cust_nation) may be "
    "either orientation of the pair. Both nation dimensions prune "
    "to 2 rows and broadcast; the OR-of-two-orientations predicate "
    "evaluates inside the join; the year extraction groups the "
    "exact-decimal revenue. The join tree is lineitem⋈orders⋈"
    "customer plus two broadcast nation lookups — fact-fact on "
    "orderkey, everything else dimension-sized.",
    oracle=f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
  CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
  CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(19,4))
       * CAST(1.0 - l.l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
    AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
  AND ((ns.n_name = '{_Q7_NATION_A}' AND nc.n_name = '{_Q7_NATION_B}')
    OR (ns.n_name = '{_Q7_NATION_B}' AND nc.n_name = '{_Q7_NATION_A}'))
GROUP BY ns.n_name, nc.n_name, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem", spread=True).filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders", spread=True)
    c = table(spark, sf_dir, "customer", spread=True)
    s = table(spark, sf_dir, "supplier", spread=True)
    n = table(spark, sf_dir, "nation", spread=True)
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    a, b = _Q7_NATION_A, _Q7_NATION_B
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(
            (
                (F.col("supp_nation") == a) & (F.col("cust_nation") == b)
            )
            | ((F.col("supp_nation") == b) & (F.col("cust_nation") == a))
        )
    )
    rev = F.col("l_extendedprice").cast("decimal(19,4)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(18,4)")
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(rev).cast("string").cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q8_market_share",
    ops=("J3", "J4", "A5", "A9", "F1"),
    doc="TPC-H Q8 national market share: the target nation's share of "
    "regional revenue per year for one part type — the "
    "ratio-of-conditional-aggregates pattern (SUM(CASE)·/SUM) over "
    "a five-way star. Region/nation/part dims prune before "
    "broadcast; numerator and denominator are both exact decimal "
    "sums VARCHAR-bridged, and the share divides once per year row.",
    oracle=f"""
SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
  ROUND(
    CAST(CAST(SUM(CASE WHEN ns.n_name = '{_Q7_NATION_A}'
         THEN CAST(l.l_extendedprice AS DECIMAL(19,4))
              * CAST(1.0 - l.l_discount AS DECIMAL(18,4))
         ELSE CAST(0 AS DECIMAL(38,8)) END) AS VARCHAR) AS DOUBLE)
    / CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(19,4))
         * CAST(1.0 - l.l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE),
    6) AS mkt_share,
  COUNT(*) AS n_lines
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
JOIN region r ON nc.n_regionkey = r.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
JOIN part p ON l.l_partkey = p.p_partkey
WHERE r.r_name = 'ASIA'
  AND p.p_type = 'PROMO'
  AND o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY o_year
ORDER BY o_year
""",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem", spread=True)
    o = table(spark, sf_dir, "orders", spread=True).filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer", spread=True)
    s = table(spark, sf_dir, "supplier", spread=True)
    n = table(spark, sf_dir, "nation", spread=True)
    r = table(spark, sf_dir, "region", spread=True).filter(
        F.col("r_name") == "ASIA"
    )
    p = table(spark, sf_dir, "part", spread=True).filter(
        F.col("p_type") == "PROMO"
    )
    nc = F.broadcast(
        n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]).select(
            F.col("n_nationkey").alias("nc_key")
        )
    )
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"),
        F.col("n_name").alias("supp_nation"),
    )
    rev = F.col("l_extendedprice").cast("decimal(19,4)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(18,4)")
    target_rev = F.when(
        F.col("supp_nation") == _Q7_NATION_A, rev
    ).otherwise(F.lit(0).cast("decimal(38,8)"))
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(nc, F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(target_rev).cast("string").cast("double")
                / F.sum(rev).cast("string").cast("double"),
                6,
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q14_promo_revenue",
    ops=("J1", "A5", "A9", "P3"),
    doc="TPC-H Q14 promotion effect: the percentage of one month's "
    "revenue attributable to promotional parts — SUM(CASE p_type)"
    "/SUM over the lineitem⋈part join with the date window pushed "
    "to the fact scan. part joins broadcast; both sums exact "
    "decimal; one output row.",
    oracle="""
SELECT
  ROUND(100.0
    * CAST(CAST(SUM(CASE WHEN p.p_type = 'PROMO'
         THEN CAST(l.l_extendedprice AS DECIMAL(19,4))
              * CAST(1.0 - l.l_discount AS DECIMAL(18,4))
         ELSE CAST(0 AS DECIMAL(38,8)) END) AS VARCHAR) AS DOUBLE)
    / CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(19,4))
         * CAST(1.0 - l.l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE),
    6) AS promo_revenue_pct,
  COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1995-09-01'
  AND l.l_shipdate < TIMESTAMP '1995-10-01'
""",
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem", spread=True).filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part", spread=True)
    rev = F.col("l_extendedprice").cast("decimal(19,4)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(18,4)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(38,8)")
    )
    return li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).agg(
        F.round(
            F.lit(100.0)
            * F.sum(promo).cast("string").cast("double")
            / F.sum(rev).cast("string").cast("double"),
            6,
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_lines"),
    )
