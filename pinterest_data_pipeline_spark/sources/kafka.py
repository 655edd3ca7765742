"""Kafka source/sink builders (the reference's MSK path — S2/S4).

The reference moves records as JSON envelopes through a Kafka REST proxy
(`{"records":[{"value": row}]}`, user_posting_emulation.py:67-90) into an
S3 JSON landing zone (README.md:150-167). The engine's equivalents:

- ``kafka_stream_reader`` / ``kafka_stream_writer``: Structured Streaming
  against real brokers (``spark-sql-kafka`` jars required — not in this
  environment, so these are construct-only here; the file-source landing
  path in sources/json_landing.py is the drop-in test substitute, which
  works because every downstream transform is source-agnostic).
- ``envelope`` / ``unenvelope``: the value serialization either way —
  pure column expressions, usable (and tested) without any broker.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def envelope(*cols: str, key_col: str | None = None) -> list[Column]:
    """Kafka writer projection: JSON-serialized value (the reference's
    record envelope, F9) and optional partition key."""
    out = [F.to_json(F.struct(*cols)).alias("value")]
    if key_col is not None:
        out.insert(0, F.col(key_col).cast("string").alias("key"))
    return out


def unenvelope(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Kafka reader projection: parse the JSON value back to typed columns
    with a DECLARED schema (never inference — SURVEY.md §1.3)."""
    return df.select(
        F.from_json(F.col("value").cast("string"), schema).alias("r")
    ).select("r.*")


def kafka_stream_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """readStream from Kafka (requires the kafka connector jars)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def kafka_stream_writer(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
):
    """writeStream to Kafka; ``df`` must already have the envelope
    projection (``value`` and optionally ``key`` columns)."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )
