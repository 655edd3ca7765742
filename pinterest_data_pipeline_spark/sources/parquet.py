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
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all testdata tables as a name→DataFrame dict (lazy plans)."""
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}
