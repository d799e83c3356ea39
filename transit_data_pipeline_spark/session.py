"""SparkSession factory.

Pins the knobs that matter for deterministic, scale-ready plans:
UTC session timezone (stable date/hour extraction — SURVEY §4 item 4),
AQE on (runtime re-planning replaces the reference's ANALYZE/VACUUM
statistics maintenance — reference `sql/performance_optimization.sql:96-109`),
and Arrow for any Pandas-UDF exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults applied to sessions we create *and* re-applied (where
#: runtime-settable) to sessions handed to us by a driver.
RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Coalesce post-shuffle partitions by DATA VOLUME (advisory size),
    # not down to a floor of defaultParallelism: with the default
    # parallelismFirst=true, every small shuffle keeps `cpus` splinter
    # partitions — at sf0.1 that is 32 scheduling-overhead tasks per
    # stage and made the 32-core bench slower than the 8-core one
    # (VERDICT r10 item 1; guide §2.2 "fewer, larger reduce
    # partitions"). Scale-adaptive by construction: partition count is
    # derived from shuffle bytes / advisory size at any scale, capped
    # above by spark.sql.shuffle.partitions. Advisory size is
    # env-tunable; 64m (Spark's default) suits the local bench, 256m
    # is the guide-§9 production setting for big clusters.
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": os.environ.get(
        "SPARK_GRAFT_PARALLELISM_FIRST", "false"
    ),
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": os.environ.get(
        "SPARK_GRAFT_ADVISORY_PARTITION", "64m"
    ),
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Exact ANSI-ish semantics are not required; reference relies on
    # permissive casts (SURVEY §2 P9).
    "spark.sql.ansi.enabled": "false",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def get_spark(app_name: str = "transit_data_pipeline_spark") -> SparkSession:
    """Return the active session or build a local one.

    Local parallelism / shuffle partitions come from SPARK_GRAFT_CPUS
    (default 32) so tests and bench share one code path. On a real
    cluster the caller's session wins — we only set runtime confs.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        configure(active)
        return active

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Truncate physical-plan strings carried inside listener-bus
        # events (static conf, default unbounded): iterative operators
        # emit multi-thousand-line plans, and megabyte
        # SQLExecutionStart payloads back the shared async bus up —
        # which every Observation.get and AQE listener then waits
        # behind (r11; guide §5 "the driver should do almost no data
        # work"). Purely driver-side bookkeeping; no effect on plans,
        # results, or the UI-less status store's correctness.
        .config("spark.sql.event.truncate.length", "2000")
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _ship_package(spark)
    return spark


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally created session and
    ship this package to Python workers (Pandas-UDF closures reference
    it by module name; executors can't import it otherwise)."""
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - static conf on live session
            pass
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    if getattr(spark, "_tdps_pkg_shipped", False):
        return
    import pathlib
    import tempfile
    import zipfile

    pkg_dir = pathlib.Path(__file__).resolve().parent
    zpath = os.path.join(
        tempfile.gettempdir(), f"transit_data_pipeline_spark_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as zf:
        for p in sorted(pkg_dir.rglob("*.py")):
            zf.write(p, arcname=str(pathlib.Path(pkg_dir.name) / p.relative_to(pkg_dir)))
    try:
        spark.sparkContext.addPyFile(zpath)
    except Exception:  # pragma: no cover - e.g. Spark Connect sessions
        pass
    spark._tdps_pkg_shipped = True
