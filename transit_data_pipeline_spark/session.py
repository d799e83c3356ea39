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
