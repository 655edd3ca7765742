"""Sources & sinks: parquet fixtures, JSON landing zone, JDBC, fixtures."""

from pinterest_data_pipeline_spark.sources.parquet import load_table, load_tables

__all__ = ["load_table", "load_tables"]
