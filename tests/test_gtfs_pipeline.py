"""End-to-end GTFS domain pipeline test: seeded fixtures → CSV ingest
→ operational → star warehouse → analysis queries, asserting the
reference's own operational invariants (SURVEY §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    from transit_data_pipeline_spark.gtfs import synth

    out = str(tmp_path_factory.mktemp("gtfs_csv"))
    frames = synth.generate(out, seed=42)
    return out, frames


@pytest.fixture(scope="module")
def pipeline(spark, fixtures):
    from transit_data_pipeline_spark.gtfs import ingest, warehouse

    csv_dir, _ = fixtures
    staging = ingest.read_staging(spark, csv_dir)
    operational = ingest.build_operational(staging)
    wh = warehouse.build_warehouse(operational)
    return staging, operational, wh


def test_quality_audits(spark, pipeline):
    from transit_data_pipeline_spark.gtfs import ingest

    staging, _, _ = pipeline
    audits = {r["check"]: r["n"] for r in ingest.quality_audits(staging).collect()}
    assert audits["stops_null_coordinates"] > 0  # fixture plants ~2%
    assert audits["trips_orphan_route"] > 0
    assert audits["stop_times_invalid_arrival"] > 0
    assert audits["calendar_services"] == 3


def test_operational_cleansing(pipeline):
    staging, op, _ = pipeline
    # null coordinates dropped
    assert op["stops"].filter(F.col("stop_lat").isNull()).count() == 0
    # orphan trips dropped by FK join
    assert op["trips"].count() < staging["trips"].count()
    # malformed arrivals dropped, parsed seconds may exceed 86400
    assert op["stop_times"].filter(F.col("arrival_s").isNull()).count() == 0
    assert op["stop_times"].filter(F.col("arrival_s") >= 86400).count() > 0
    # calendar booleans are real booleans
    assert dict(op["calendar"].dtypes)["monday"] == "boolean"


def test_gtfs_time_parser(spark):
    from transit_data_pipeline_spark.gtfs.ingest import gtfs_time_to_seconds

    df = spark.createDataFrame(
        [("25:10:00",), ("07:05:30",), ("bad:time",), (None,)], "t string"
    ).select(gtfs_time_to_seconds(F.col("t")).alias("s"))
    assert [r["s"] for r in df.collect()] == [25 * 3600 + 600, 7 * 3600 + 330, None, None]


def test_warehouse_invariants(pipeline):
    _, op, wh = pipeline
    # FIXTURES.md derived-layer checks
    assert wh["dim_time"].count() == 96
    assert wh["dim_weather"].count() == 8
    # dim_date spans min→max of delay_events dates
    lo, hi = op["delay_events"].agg(
        F.min(F.to_date("actual_arrival")), F.max(F.to_date("actual_arrival"))
    ).first()
    n_days = (hi - lo).days + 1
    assert wh["dim_date"].count() == n_days
    # fact rows = delay events surviving the dimension joins
    assert 0 < wh["fact_delay_events"].count() <= op["delay_events"].count()
    # the reference's delay_category quirk: delay 0..5 boundaries
    cats = {
        r["delay_category"]
        for r in wh["fact_delay_events"].select("delay_category").distinct().collect()
    }
    assert cats <= {"Minor", "Moderate", "Severe", "Extreme"}
    # surrogate keys deterministic + dense
    keys = [r["route_key"] for r in wh["dim_route"].orderBy("route_key").collect()]
    assert keys == list(range(1, len(keys) + 1))


def test_reconciliation_counts(pipeline):
    from transit_data_pipeline_spark.gtfs import ingest

    staging, op, _ = pipeline
    rec = ingest.reconciliation_counts(staging, op).collect()
    by = {(r["table_name"], r["layer"]): r["n_rows"] for r in rec}
    assert by[("stops", "operational")] <= by[("stops", "staging")]
    assert by[("calendar", "operational")] == by[("calendar", "staging")]


def test_upsert_ignore_duplicates(spark):
    from transit_data_pipeline_spark.gtfs.ingest import upsert_ignore_duplicates

    existing = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    incoming = spark.createDataFrame([(2, "XX"), (3, "c")], "k int, v string")
    out = upsert_ignore_duplicates(existing, incoming, ["k"]).orderBy("k").collect()
    assert [(r["k"], r["v"]) for r in out] == [(1, "a"), (2, "b"), (3, "c")]


def test_analysis_queries_run(pipeline):
    from transit_data_pipeline_spark.gtfs import analysis

    _, _, wh = pipeline
    for name, fn in analysis.ALL_QUERIES.items():
        df = fn(wh)
        assert df.count() > 0, name
    # q9 takes the frozen as-of parameter
    max_dk = wh["fact_delay_events"].agg(F.max("date_key")).first()[0]
    assert analysis.q9_recent_vs_historical(wh, max_dk).count() > 0


def test_materialized_views(pipeline, tmp_path, spark):
    from transit_data_pipeline_spark.gtfs import warehouse

    _, _, wh = pipeline
    out = str(tmp_path / "mv")
    warehouse.refresh_materialized_views(wh, out)
    mv = spark.read.parquet(f"{out}/mv_route_performance")
    assert mv.count() > 0 and "median_delay" in mv.columns


def test_dashboard_queries(spark, pipeline):
    """Every dashboard widget query runs and respects its contract:
    date filtering, top-k size, per-group aggregates (ref
    `streamlit_dashboard.py` entry path)."""
    from transit_data_pipeline_spark.gtfs import dashboard as dash

    _, operational, wh = pipeline
    ev = operational["delay_events"]
    lo, hi = ev.agg(
        F.date_format(F.min(F.to_date("actual_arrival")), "yyyy-MM-dd"),
        F.date_format(F.max(F.to_date("actual_arrival")), "yyyy-MM-dd"),
    ).first()

    routes = dash.route_options(wh["dim_route"]).collect()
    assert len(routes) == len({r.route_id for r in routes})  # distinct

    kpi = dash.kpi_metrics(ev, lo, hi).first()
    assert kpi.total_delays == ev.count()  # full range covers all rows
    assert kpi.high_risk_delays == ev.filter(F.col("delay_minutes") > 20).count()

    trend = dash.daily_trend(ev, lo, hi)
    assert trend.agg(F.sum("delay_count")).first()[0] == ev.count()

    top = dash.top_routes(ev, operational["trips"], lo, hi, k=5).collect()
    assert len(top) <= 5
    counts = [r.delay_count for r in top]
    assert counts == sorted(counts, reverse=True)

    hours = dash.hourly_pattern(ev, lo, hi).select("hour").collect()
    assert all(0 <= r.hour <= 23 for r in hours)

    weather = dash.weather_impact(ev, lo, hi).collect()
    avgs = [r.avg_delay for r in weather]
    assert avgs == sorted(avgs, reverse=True)

    # narrow range filters rows out
    assert dash.kpi_metrics(ev, lo, lo).first().total_delays <= kpi.total_delays
