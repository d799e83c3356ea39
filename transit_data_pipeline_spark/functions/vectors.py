"""Vector math as column expressions (no UDFs): dot products, norms,
cosine similarity over `array<float>` embedding columns.

Everything is a left-fold (`aggregate`) over doubles so Spark and the
DuckDB oracle (`list_reduce`) evaluate in the same order → bitwise
equal results. At 100 TB these stay inside codegen; a Pandas-UDF/BLAS
variant only wins for very wide vectors (>1k dims) and is provided in
streaming/multimodal paths where batching already exists.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a sequential left fold from 0.0."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    """dot / (‖a‖·‖b‖) with the norm product evaluated exactly as the
    oracle spells it."""
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


# --- DuckDB oracle spellings (1-based list indexing) -----------------------

def sql_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
        f"(acc, x) -> acc + x)"
    )


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / (SQRT({sql_dot(a, a)}) * SQRT({sql_dot(b, b)})))"
