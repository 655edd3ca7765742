"""Registry mapping query names → (Spark plan builder, DuckDB oracle SQL).

Every operator the engine claims is registered here with:
- a PySpark builder ``(spark, sf_dir) -> DataFrame``
- optionally, an equivalent ANSI-SQL string the DuckDB oracle runs on the
  same parquet tables (omitted only for genuinely non-SQL-expressible ops,
  which the driver then checks rows-only).

Column names are aliased identically on both sides: the driver's comparator
sorts columns by name before value-hashing, so any alias drift is a fail
even when values match.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and its oracle SQL, if expressible)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = " ".join(oracle.split())
        return fn

    return deco
