"""Feature engineering + SparkML pipeline tests (ref train/predict)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def feature_frames(spark, tmp_path_factory):
    from transit_data_pipeline_spark.gtfs import features, ingest, synth

    out = str(tmp_path_factory.mktemp("gtfs_ml"))
    synth.generate(out, seed=42)
    staging = ingest.read_staging(spark, out)
    op = ingest.build_operational(staging)
    as_of = op["delay_events"].agg(
        F.date_format(F.max(F.to_date("actual_arrival")), "yyyy-MM-dd")
    ).first()[0]
    feats = features.build_features(op, as_of).cache()
    return op, feats


def test_feature_table_shape(feature_frames):
    op, feats = feature_frames
    assert feats.count() > 0
    # wide frame: base + interactions + 11 historical aggregates
    assert len(feats.columns) >= 30
    # COALESCE(...,0) semantics: no nulls in historical aggregates
    for c in [c for c in feats.columns if c.startswith("avg_delay_")]:
        assert feats.filter(F.col(c).isNull()).count() == 0, c


def test_split_deterministic(feature_frames):
    from transit_data_pipeline_spark.gtfs.features import train_test_views

    _, feats = feature_frames
    tr1, te1 = train_test_views(feats)
    tr2, te2 = train_test_views(feats)
    n, ntr, nte = feats.count(), tr1.count(), te1.count()
    assert ntr + nte == n
    assert abs(ntr - 0.8 * n) <= 1  # 80/20
    assert tr1.select("feature_id").subtract(tr2.select("feature_id")).count() == 0
    # time-ordered: max train date <= min test date boundary-ish
    assert (
        tr1.agg(F.max("event_date")).first()[0]
        <= te1.agg(F.max("event_date")).first()[0]
    )


def test_train_evaluate_predict(feature_frames):
    from transit_data_pipeline_spark.gtfs import ml
    from transit_data_pipeline_spark.gtfs.features import train_test_views

    _, feats = feature_frames
    train_df, test_df = train_test_views(feats)
    model = ml.train(train_df, max_depth=4, max_iter=10)
    metrics = ml.evaluate(model, test_df)
    assert set(metrics) == {"rmse", "mae", "r2", "acc_5min", "acc_10min"}
    assert metrics["mae"] > 0
    assert 0 <= metrics["acc_10min"] <= 1

    preds = ml.with_risk_level(model.transform(test_df.na.fill(0, subset=list(ml.NUMERIC))))
    levels = {r["risk_level"] for r in preds.select("risk_level").distinct().collect()}
    assert levels <= {"Low", "Medium", "High", "Severe"}

    best, worst = ml.best_worst_predictions(preds)
    b = best.agg(F.max("abs_error")).first()[0]
    w = worst.agg(F.min("abs_error")).first()[0]
    assert b <= w


def test_model_roundtrip(feature_frames, tmp_path, spark):
    from pyspark.ml import PipelineModel

    from transit_data_pipeline_spark.gtfs import ml
    from transit_data_pipeline_spark.gtfs.features import train_test_views

    _, feats = feature_frames
    train_df, test_df = train_test_views(feats)
    model = ml.train(train_df, max_depth=3, max_iter=5)
    path = str(tmp_path / "model")
    model.write().overwrite().save(path)
    loaded = PipelineModel.load(path)
    test_in = test_df.na.fill(0, subset=list(ml.NUMERIC))
    a = model.transform(test_in).agg(F.sum("prediction")).first()[0]
    b = loaded.transform(test_in).agg(F.sum("prediction")).first()[0]
    assert a == b


def test_future_prediction(spark, feature_frames, tmp_path):
    """Future-mode end-to-end (ref `predict_delays.py:196-376`): frame
    built from calendar day-columns, model scores it unmodified, risk
    levels attach, alert gate and metrics sink work."""
    from transit_data_pipeline_spark.gtfs import ml, predict

    operational, features = feature_frames
    train_df, _ = __import__(
        "transit_data_pipeline_spark.gtfs.features", fromlist=["train_test_views"]
    ).train_test_views(features)
    model = ml.train(train_df, max_iter=3, max_depth=3)

    # a date inside the synth calendar horizon (synth starts 2025-06-02)
    frame = predict.build_future_frame(operational, "2025-06-09", max_trips=20)
    n = frame.count()
    assert n > 0
    assert set(ml.NUMERIC) <= set(frame.columns)
    assert frame.select("weather_condition").distinct().first()[0] == "clear"

    preds = predict.predict_for_date(model, frame, k=50)
    rows = preds.collect()
    assert 0 < len(rows) <= 50
    assert {r.risk_level for r in rows} <= {"Low", "Medium", "High", "Severe"}
    # worst-first ordering
    vals = [r.prediction for r in rows]
    assert vals == sorted(vals, reverse=True)

    alert = predict.high_risk_alert(preds)
    assert set(alert) == {"n_high_risk_trips", "alert"}

    sink = str(tmp_path / "model_metrics")
    predict.save_model_metrics(
        spark, {"rmse": 1.0, "mae": 0.5}, "v1", "2025-06-08T00:00:00", sink
    )
    back = spark.read.parquet(sink)
    assert back.count() == 1 and back.first().model_version == "v1"


def test_monitor_predictions(spark):
    """Accuracy floor gate (ref `ml_pipeline_dag.py:386-388`)."""
    from transit_data_pipeline_spark.gtfs.predict import monitor_predictions

    preds = spark.createDataFrame(
        [("t1", "s1", "2025-06-09", 5.0), ("t2", "s1", "2025-06-09", 30.0)],
        "trip_id string, stop_id string, event_date string, prediction double",
    )
    actuals = spark.createDataFrame(
        [("t1", "s1", "2025-06-09", 7.0), ("t2", "s1", "2025-06-09", 2.0)],
        "trip_id string, stop_id string, event_date string, delay_minutes double",
    )
    out = monitor_predictions(preds, actuals)
    assert out["n_matched"] == 2
    assert out["acc_10min"] == 0.5 and out["alert"] is True

    ok = monitor_predictions(preds.limit(1), actuals)
    assert ok["n_matched"] == 1 and ok["alert"] is False


def test_retrain_weekly(spark, feature_frames):
    """Weekly retrain: recency window + deterministic cap, model fits."""
    from transit_data_pipeline_spark.gtfs.predict import retrain_weekly

    _, features = feature_frames
    as_of = features.agg(
        __import__("pyspark.sql.functions", fromlist=["F"]).date_format(
            __import__("pyspark.sql.functions", fromlist=["F"]).max("event_date"),
            "yyyy-MM-dd",
        )
    ).first()[0]
    model = retrain_weekly(features, as_of, sample_cap=500, max_iter=2, max_depth=2)
    preds = model.transform(
        features.na.fill(0).limit(20)
    )
    assert preds.filter(preds.prediction.isNotNull()).count() == 20


def test_daily_pipeline_chain(spark, feature_frames, tmp_path):
    """The composed daily DAG chain (ref `ml_pipeline_dag.py:522`):
    quality >> features >> predict >> monitor >> alert >> cleanup in
    one call, from a PERSISTED model artifact, idempotent on re-run."""
    from transit_data_pipeline_spark.gtfs import ml, pipeline
    from transit_data_pipeline_spark.gtfs.features import train_test_views

    operational, features = feature_frames
    train_df, _ = train_test_views(features)
    model = ml.train(train_df, max_depth=3, max_iter=3)
    model_path = str(tmp_path / "artifact")
    ml.save_model(model, model_path, version="v2", trained_at="2025-06-29T00:00:00")
    loaded, meta = ml.load_model(model_path)
    assert meta["model_version"] == "v2"
    assert meta["numeric"] == list(ml.NUMERIC)

    as_of = operational["delay_events"].agg(
        F.date_format(F.max(F.to_date("actual_arrival")), "yyyy-MM-dd")
    ).first()[0]
    out_dir = str(tmp_path / "stores")
    result = pipeline.run_daily_pipeline(
        spark, operational, as_of, model_path, out_dir, max_trips=20
    )
    assert result["status"] == "ok"
    assert all(result["quality"].values())
    assert result["predictions"]["model_version"] == "v2"
    assert set(result["monitor"]) == {"n_matched", "mae", "acc_10min", "alert"}
    assert set(result["alert"]) == {"n_high_risk_trips", "alert"}

    preds = spark.read.parquet(result["predictions"]["store"])
    n_first = preds.count()
    assert n_first > 0

    # Idempotent re-run: same date overwrites its partition, not appends.
    result2 = pipeline.run_daily_pipeline(
        spark, operational, as_of, model_path, out_dir, max_trips=20
    )
    assert result2["status"] == "ok"
    assert spark.read.parquet(result["predictions"]["store"]).count() == n_first

    # Retention: a partition older than the window is dropped.
    import os

    old_dir = os.path.join(result["predictions"]["store"], "prediction_date=2024-01-01")
    # re-read: the re-run overwrote the partition, `preds` has a stale file list
    one = (
        spark.read.parquet(result["predictions"]["store"])
        .drop("prediction_date")
        .limit(1)
        .collect()
    )
    spark.createDataFrame(one).write.mode("overwrite").parquet(old_dir)
    swept = pipeline.cleanup_old_predictions(
        spark, result["predictions"]["store"], as_of, retention_days=30
    )
    assert swept["n_partitions_dropped"] == 1
    assert not os.path.isdir(old_dir)


def test_train_cv_literal_grid(feature_frames):
    """The reference's 4-cell grid (train_delay_model.py:292-309) as
    CrossValidator: every cell is scored, the best cell's params are
    reported, and the returned model is a fitted pipeline (shrunk
    depths/iters keep the test fast; the cell COUNT is the contract)."""
    from transit_data_pipeline_spark.gtfs import ml
    from transit_data_pipeline_spark.gtfs.features import train_test_views

    _, feats = feature_frames
    train_df, test_df = train_test_views(feats)
    model, summary = ml.train_cv(
        train_df, max_depths=(2, 3), min_instances=(1, 3),
        num_folds=2, max_iter=3,
    )
    assert len(summary["cells"]) == 4
    assert all(c["cv_rmse"] > 0 for c in summary["cells"])
    assert summary["best_cv_rmse"] == min(
        c["cv_rmse"] for c in summary["cells"]
    )
    bp = summary["best_params"]
    assert bp["max_depth"] in (2, 3) and bp["min_instances_per_node"] in (1, 3)
    metrics = ml.evaluate(model, test_df)
    assert metrics["rmse"] > 0
