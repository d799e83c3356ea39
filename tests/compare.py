"""Spark-vs-DuckDB comparison harness mimicking the driver's t2 gate:
row count + schema-width + order-insensitive value comparison with
exact equality (floats included — our aggregates are built to be
bitwise deterministic)."""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb
import pandas as pd

from transit_data_pipeline_spark.catalog import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    if getattr(v, "ndim", 0) >= 1:  # numpy array (DuckDB LIST column)
        return tuple(_norm_cell(x) for x in v.tolist())
    if hasattr(v, "item"):  # numpy scalar
        return _norm_cell(v.item())
    return v


def _canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def compare(spark_df, oracle_sql: str, con: duckdb.DuckDBPyConnection) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    sp = spark_df.toPandas()
    du = con.execute(oracle_sql).df()
    if sorted(sp.columns) != sorted(du.columns):
        problems.append(f"columns differ: spark={sorted(sp.columns)} duck={sorted(du.columns)}")
        return problems
    if len(sp) != len(du):
        problems.append(f"row count differs: spark={len(sp)} duck={len(du)}")
    a, b = _canon(sp), _canon(du)
    if len(a) == len(b):
        n_bad = 0
        for i, (ra, rb) in enumerate(zip(a, b)):
            if ra != rb:
                n_bad += 1
                if n_bad <= 3:
                    problems.append(f"row {i} differs:\n  spark={ra}\n  duck ={rb}")
        if n_bad:
            problems.append(f"{n_bad}/{len(a)} rows differ")
    elif not problems:
        problems.append("row sets differ")
    return problems
