"""Table catalog over the driver's parquet test tables.

Explicit declared schemas (never inference in production paths —
SURVEY §1 "Schema system") and a single loader shared by queries,
tests, and bench. Dimension-sized tables are flagged so join sites
can `broadcast()` them (SURVEY §4: "broadcast the six dims").
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: All driver-provided tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Tables that stay dimension-sized at any scale factor → broadcast
#: candidates. region/nation are fixed-cardinality; supplier/part grow
#: slowly and stay far under the broadcast threshold at tested SFs.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part"})


def table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Read one driver table. Parquet scan → columnar vectorized read
    with predicate pushdown + column pruning for free downstream.

    ``spread=True`` adds a round-robin repartition to default
    parallelism. The driver tables are single-row-group parquet files,
    and a row group cannot be split — so scan-side work is one task no
    matter the cluster size. For CPU-heavy map-side operators (md5
    shingling, regex scoring, vector folds) the one-time shuffle buys
    full-cluster parallelism. Leave False for scan→aggregate queries,
    where the map side is cheap and the shuffle would dominate; on a
    real multi-row-group layout this flag is a no-op conceptually.

    ``events`` is stored with TIMESTAMP(NANOS) which Spark's parquet
    reader rejects; we read nanos as LONG (``ts`` stays raw nanoseconds)
    and expose a derived microsecond ``event_time`` timestamp. DuckDB
    oracle twin: ``make_timestamp(epoch_ns(ts) // 1000)``.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        df = df.withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if spread:
        df = df.repartition(max(spark.sparkContext.defaultParallelism, 8))
    return df


def tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several tables at once: ``t = tables(spark, d, 'orders', ...)``."""
    use = names or TABLES
    return {n: table(spark, sf_dir, n) for n in use}


def dim(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """A dimension table with an explicit broadcast hint."""
    df = table(spark, sf_dir, name)
    return F.broadcast(df) if name in BROADCAST_TABLES else df
