"""transit_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference ETL/warehouse/ML
pipeline (yashbhaskarwar/transit-data-pipeline), plus the
large-scale training-data operators (dedup, similarity search,
text analysis, multimodal plumbing) a 100 TB pipeline needs.

Design principles (see SURVEY.md §4, §7):
  * Declarative DataFrame / Spark SQL plans — let Catalyst + AQE pick
    physical strategies (broadcast vs sort-merge, skew handling).
  * No row-at-a-time Python UDFs in hot paths; column expressions
    stay inside whole-stage codegen, Pandas UDFs only where built-ins
    genuinely can't express the semantics.
  * Deterministic results: seeded randomness, frozen "now",
    decimal-exact aggregation so results are reproducible across
    partitionings and engines.
"""

__version__ = "0.1.0"
