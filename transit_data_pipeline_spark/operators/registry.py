"""Registry of named queries with DuckDB oracle twins.

Every operator class from SURVEY.md §2 gets at least one named query
here. The driver contract (`__spark_entry__.py`) exposes the registry
via ``queries()`` / ``oracle_sql()``; pytest runs the same pairs
locally against DuckDB at sf0.001/sf0.01.

Conventions (driver hash-compare requirements):
  * every computed column is aliased identically in Spark and SQL;
  * floating aggregates use the deterministic decimal-exact helpers
    (:mod:`..functions.numeric`) on BOTH sides;
  * top-k queries carry explicit tiebreaker sort keys so the row SET
    is unique even though the driver hash is order-insensitive.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: Operator modules loaded by :func:`all_specs`.
_MODULES = (
    "transit_data_pipeline_spark.operators.relational",
    "transit_data_pipeline_spark.operators.analysisq",
    "transit_data_pipeline_spark.operators.windows",
    "transit_data_pipeline_spark.operators.events",
    "transit_data_pipeline_spark.operators.pipelineops",
    "transit_data_pipeline_spark.operators.sources",
    "transit_data_pipeline_spark.operators.mlops",
    "transit_data_pipeline_spark.operators.streamingops",
    "transit_data_pipeline_spark.operators.sketches",
    "transit_data_pipeline_spark.operators.textops",
    "transit_data_pipeline_spark.operators.dedup",
    "transit_data_pipeline_spark.operators.similarity",
    "transit_data_pipeline_spark.operators.multimodal",
    "transit_data_pipeline_spark.operators.curation",
    "transit_data_pipeline_spark.operators.mlprep",
    "transit_data_pipeline_spark.operators.timeseries",
    "transit_data_pipeline_spark.operators.tpch",
    "transit_data_pipeline_spark.operators.statsaudit",
    "transit_data_pipeline_spark.operators.graphops",
)


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None → driver rows-only check
    ops: tuple[str, ...] = ()  # SURVEY §2 operator ids covered
    doc: str = ""
    bench: bool = field(default=True)  # include in bench.py headline set


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    *,
    oracle: str | None,
    ops: tuple[str, ...] = (),
    doc: str = "",
    bench: bool = True,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, ops=ops, doc=doc or (fn.__doc__ or ""), bench=bench
        )
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    """Import all operator modules (idempotent) and return the registry."""
    for mod in _MODULES:
        importlib.import_module(mod)
    return dict(_REGISTRY)
