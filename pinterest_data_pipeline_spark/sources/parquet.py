"""Parquet table loaders for the driver testdata layout.

One parquet file per table under ``{sf_dir}/{name}.parquet`` (TESTDATA.md).
Parquet gives vectorized scans, predicate pushdown, and column pruning for
free — the filters/projections in the query layer reach the scan because we
keep the plan declarative (verify with ``df.explain("formatted")``:
``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pinterest_data_pipeline_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Column pruning / filter pushdown is left to
    Catalyst — callers express projections on the returned DataFrame."""
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the events table, normalizing its TIMESTAMP(NANOS) column.

    The fixture writes ``ts`` as parquet nanosecond timestamps, which
    Spark 4 rejects outright (PARQUET_TYPE_ILLEGAL) under default config.
    We flip the legacy read flag (runtime-settable) so nanos arrive as
    int64, then floor-divide to microseconds JVM-side — integer ``div``,
    not ``/``, because a double intermediate loses precision above 2^53.
    DuckDB truncates ns→us the same way, so oracle timestamps agree.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    # Adaptive: the driver fixture stores nanos (arrives as long under the
    # legacy flag); re-written/compacted copies store a real timestamp and
    # need no conversion.
    if isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all testdata tables as a name→DataFrame dict (lazy plans)."""
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}
