"""File-level data skipping over plain parquet: min/max manifests.

Parquet footers already carry per-column min/max, and engines with a
table format (Delta/Iceberg) prune files from transaction-log stats. On
plain parquet directories Spark only prunes *row groups* after opening
each file — at 100 TB with millions of files, just opening footers is a
planning-time bottleneck. This operator maintains the stats table
explicitly: one tiny manifest DataFrame (file → min/max per indexed
column), built once per ingest with a single distributed scan, then any
range predicate prunes to the matching file list and the query reads
ONLY those paths.

This is the poor-man's table format: manifest build is O(data) once,
every later query is O(manifest) planning + O(selected files) reading.
Works best when the layout correlates with the indexed column (e.g.
files written sorted/range-partitioned on it — `repartitionByRange` +
`sortWithinPartitions` at write time, as `sources/sinks.py` does for
date partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_manifest(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """One distributed scan → per-file min/max for each indexed column.

    Output schema: (file, n_rows, <c>_min, <c>_max ...). The manifest is
    tiny (one row per file) — collect it, broadcast it, or store it next
    to the data and maintain it incrementally per ingest batch (union new
    files' rows; `input_file_name` keys make that idempotent)."""
    df = spark.read.parquet(path)
    aggs = [F.count("*").cast("bigint").alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return (
        df.withColumn("file", F.input_file_name())
        .groupBy("file")
        .agg(*aggs)
    )


def prune_files(
    manifest: DataFrame, col: str, lo, hi
) -> list[str]:
    """Files whose [min, max] range can contain a value in [lo, hi] —
    everything else is provably irrelevant and never opened."""
    hit = manifest.filter(
        (F.col(f"{col}_max") >= F.lit(lo)) & (F.col(f"{col}_min") <= F.lit(hi))
    )
    return [r["file"] for r in hit.select("file").collect()]


def read_pruned(
    spark: SparkSession,
    manifest: DataFrame,
    col: str,
    lo,
    hi,
) -> DataFrame:
    """Range query through the manifest: read only surviving files, then
    apply the exact predicate (file granularity is a superset)."""
    files = prune_files(manifest, col, lo, hi)
    if not files:
        # fully pruned: empty result with the data's schema (read any one
        # known file, keep no rows — touches a single footer)
        any_file = [r["file"] for r in manifest.select("file").limit(1).collect()]
        if not any_file:
            raise ValueError("empty manifest — no schema source")
        return spark.read.parquet(any_file[0]).filter(F.lit(False))
    return (
        spark.read.parquet(*files)
        .filter((F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi)))
    )
