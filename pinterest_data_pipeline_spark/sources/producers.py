"""Producer emulation: the reference's row-sampling record producers,
re-expressed as Spark plans (S1-S3, SURVEY.md §2.1/§3.1-3.2).

The reference runs an infinite Python loop pulling ONE random row per
table per tick and POSTing it as a JSON envelope
(user_posting_emulation.py:33-96; streaming variant puts a Kinesis
envelope, user_posting_emulation_streaming.py:64-105). That shape caps
ingest at ~1 row/s/table. The engine keeps the semantics (sample rows →
wrap in a JSON envelope → emit to a topic/landing zone) but as set-based
plans: a whole sample batch is enveloped and written in one job.

Note the reference's streaming producer bug — every payload names the
`pin` stream while PUTting to its own URL
(user_posting_emulation_streaming.py:74,83,92 vs 64-66) — is deliberately
NOT reproduced: stream_name here always matches the target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def sample_rows_at_offsets(
    df: DataFrame, order_col: str, offsets: list[int], num_ranges: int | None = None
) -> DataFrame:
    """Deterministic 'row at offset N' sampling — the set-based form of
    the producer's ``LIMIT {offset}, 1`` loop (user_posting_emulation.py:
    41-57). One pass emits all requested offsets instead of one query per
    row.

    Global row numbers are computed WITHOUT a single-partition global
    window: rows are range-partitioned on ``order_col``, per-partition row
    counts (one row per partition — metadata, not data) are collected to
    the driver, and each partition's cumulative base offset is added to a
    per-partition row_number. Cost = one range shuffle + one in-partition
    sort, the same as any distributed orderBy."""
    spark = df.sparkSession
    if num_ranges is None:
        num_ranges = spark.sparkContext.defaultParallelism
    # Persist the range-partitioned snapshot: partition ids must be
    # identical between the count pass and the numbering pass (range
    # boundaries come from sampling, so a lineage recompute could move
    # boundary rows between partitions).
    ranged = (
        df.repartitionByRange(num_ranges, F.col(order_col))
        .withColumn("__pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = ranged.groupBy("__pid").agg(F.count("*").alias("__n")).collect()
    bases, acc = [], 0
    for row in sorted(counts, key=lambda r: r["__pid"]):
        bases.append((row["__pid"], acc))
        acc += row["__n"]
    base_df = F.broadcast(
        spark.createDataFrame(bases or [(0, 0)], "__pid int, __base long")
    )
    w = Window.partitionBy("__pid").orderBy(F.col(order_col))
    return (
        ranged.join(base_df, "__pid")
        .withColumn("__rn", F.col("__base") + F.row_number().over(w) - 1)
        .filter(F.col("__rn").isin(offsets))
        .drop("__pid", "__base", "__rn")
    )


def kafka_records_envelope(df: DataFrame) -> DataFrame:
    """Batch-producer wire format: ``{"records": [{"value": <row>}]}``
    (user_posting_emulation.py:67-90 / reference README.md:214-221), one
    envelope per row."""
    return df.select(
        F.to_json(
            F.struct(
                F.array(F.struct(F.struct(*df.columns).alias("value"))).alias(
                    "records"
                )
            )
        ).alias("payload")
    )


def kinesis_record_envelope(df: DataFrame, stream_name: str, key_col: str) -> DataFrame:
    """Streaming-producer wire format: ``{"StreamName": ..., "Data": {...},
    "PartitionKey": ...}`` (user_posting_emulation_streaming.py:73-98),
    with the stream name correctly matching the target (bug not ported)."""
    return df.select(
        F.to_json(
            F.struct(
                F.lit(stream_name).alias("StreamName"),
                F.struct(*df.columns).alias("Data"),
                F.col(key_col).cast("string").alias("PartitionKey"),
            )
        ).alias("payload")
    )
