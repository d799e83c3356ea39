"""Sketch operators: distributed cardinality estimation that stays
deterministic.

Spark's `approx_count_distinct` (HyperLogLog++) and DuckDB's
`approx_count_distinct` use different sketches, so they can never
cross-check. A KMV (k-minimum-values) sketch over a keyed md5 hash is
just as mergeable — the k smallest hashes of a union are a subset of
the union of each side's k smallest — but every engine computes the
SAME estimate, which keeps the sketch inside the bitwise oracle gate.

Estimator: with u_k = the k-th smallest hash mapped into (0,1),
D̂ = (k−1)/u_k  (Bar-Yossef et al., 2002). Relative error ~ 1/√k.

At 100 TB the same plan holds: per-partition top-k-smallest partials
(the window below becomes a partial aggregate), merged once — state is
k hashes per group, independent of cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from .registry import register

_K = 64
#: Map the first 15 hex digits of md5 into (0,1): 15 digits = 60 bits,
#: exactly representable in a double, identical in both engines.
_DENOM = float(16**15)


@register(
    "sketch_kmv_distinct",
    ops=("A2", "W4"),
    doc="KMV distinct-count sketch per order priority: k=64 minimum "
    "md5 hash values per group → (k−1)/u_k estimate, emitted beside "
    "the exact COUNT(DISTINCT) so the error is visible. Deterministic "
    "keyed hashing makes the sketch itself oracle-checkable — unlike "
    "HLL, where every engine's estimate differs.",
    oracle=f"""
WITH hashed AS (
  SELECT DISTINCT o_orderpriority,
    CAST(concat('0x', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
      / {_DENOM!r} AS u
  FROM orders
), ranked AS (
  SELECT o_orderpriority, u,
    ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY u) AS rn
  FROM hashed
), kth AS (
  SELECT o_orderpriority, MAX(u) AS u_k, COUNT(*) AS n_kept
  FROM ranked WHERE rn <= {_K}
  GROUP BY o_orderpriority
), exact AS (
  SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS exact_distinct
  FROM orders GROUP BY o_orderpriority
)
SELECT e.o_orderpriority, e.exact_distinct,
  CASE WHEN k.n_kept < {_K} THEN CAST(k.n_kept AS DOUBLE)
       ELSE ({_K} - 1) / k.u_k END AS kmv_estimate
FROM exact e JOIN kth k ON e.o_orderpriority = k.o_orderpriority
""",
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    u = (
        F.conv(F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .cast("double")
        / F.lit(_DENOM)
    )
    hashed = o.select("o_orderpriority", u.alias("u")).distinct()
    rn = F.row_number().over(
        Window.partitionBy("o_orderpriority").orderBy("u")
    )
    kth = (
        hashed.withColumn("rn", rn)
        .filter(F.col("rn") <= _K)
        .groupBy("o_orderpriority")
        .agg(F.max("u").alias("u_k"), F.count(F.lit(1)).alias("n_kept"))
    )
    exact = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact_distinct")
    )
    est = F.when(
        F.col("n_kept") < _K, F.col("n_kept").cast("double")
    ).otherwise((_K - 1) / F.col("u_k"))
    return exact.join(kth, "o_orderpriority").select(
        "o_orderpriority", "exact_distinct", est.alias("kmv_estimate")
    )
