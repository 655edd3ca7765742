"""Scan fan-out: guarantee cluster-wide parallelism for expensive
per-row projections regardless of input file layout.

Spark parallelizes a parquet scan by byte-range splits, but a split only
produces rows if a row-group STARTS inside it — a table written as one
file with one giant row group (exactly the driver fixture's layout, and a
common real-world hazard: single-shard exports, over-large
``parquet.block.size``, concatenated dumps) scans as ONE task no matter
how many cores exist. Any expensive projection chained onto that scan
(shingle hashing, 64-bit SimHash folds, vector norms + distance folds)
then runs serially — measured 5.3 s of an LSH run's 7.7 s at sf0.1 on
local[32] was the single-task shingle stage.

``fan_out`` inserts one round-robin repartition of the RAW rows before
the heavy projection, so the expensive expressions execute after the
exchange at full parallelism. When the source is already split into
enough partitions (the normal many-files case at cluster scale), it is a
NO-OP — it never adds a shuffle to a well-laid-out input, so the
100 TB plan is unchanged while degenerate layouts stop serializing.

The shuffle it may add moves the raw projection INPUT (ids + text /
vectors) once; every pipeline this is used in already shuffles derived
data at least once downstream, so the added volume is bounded by one
extra pass over the columns the projection reads — the price of turning
a serial stage into a parallel one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's shuffle
    parallelism iff its current partitioning is materially narrower;
    otherwise return it untouched."""
    spark = df.sparkSession
    target = min_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    # getNumPartitions inspects the planned RDD lineage — no job runs
    current = df.rdd.getNumPartitions()
    if current * 2 >= target:
        return df
    return df.repartition(target)
