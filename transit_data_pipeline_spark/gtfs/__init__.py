"""GTFS transit-domain pipeline — the reference's own workload
re-expressed Spark-first: CSV ingest → cleansed operational tables →
Kimball star schema → analysis queries → ML feature table → model.

Reference mapping (SURVEY.md §7 build order):
  schemas.py   ← sql/create_schema.sql DDL
  synth.py     ← generate_synthetic_data.py (seeded)
  ingest.py    ← sql/load_gtfs_data.sql
  warehouse.py ← sql/fact_dim_tables.sql + performance_optimization.sql
  analysis.py  ← sql/analysis_queries.sql (9 queries)
  features.py  ← sql/ml_feature_engineering.sql
  ml.py        ← train_delay_model.py / predict_delays.py
"""
