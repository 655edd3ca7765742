"""Spark 4 Python Data Source wrapping the posting-producer emulation.

The reference's producers are driver-side infinite Python loops pulling
one row at a time and POSTing it (user_posting_emulation.py:33-96). This
module re-expresses that surface as a first-class Spark data source via
the Python Data Source API (`pyspark.sql.datasource`), so the emulated
feed composes with everything else in the engine:

- **batch**: ``spark.read.format("posting_emulation")`` generates the
  deterministic fixture rows IN THE EXECUTORS, partition-parallel — no
  driver-side loop, no collect. Each partition seeds its own RNG from
  (seed, partition_id), so output is reproducible AND generation scales
  with the partition count.
- **streaming**: ``spark.readStream.format("posting_emulation")`` emits
  ``rows_per_batch`` rows per micro-batch with a monotonically advancing
  offset — the reference's "one row per tick" loop, but with replayable
  offsets (exactly-once on restart) instead of fire-and-forget POSTs.

Options: ``topic`` (pin|geo|user), ``n`` (total rows, batch / stream
exhaustion bound), ``seed``, ``partitions`` (batch), ``rows_per_batch``
(stream).

Usage requires one-time registration per session:
``register_posting_emulation(spark)``.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_TOPIC_INDEX = {"pin": 0, "geo": 1, "user": 2}


def _topic_schema(topic: str) -> StructType:
    from pinterest_data_pipeline_spark.schemas import GEO_RAW, PIN_RAW, USER_RAW

    return {"pin": PIN_RAW, "geo": GEO_RAW, "user": USER_RAW}[topic]


def _generate_slice(
    topic: str, start: int, end: int, seed: int, mode: str = "emulation"
) -> list[tuple]:
    """Rows [start, end) for one topic. Each row is a pure function of
    (topic, row index, seed) — its RNG seeds from (seed, index) alone — so
    the SAME rows come back for any partitioning, any batch size, and any
    offset replay; executors never need driver RNG state. Rows with equal
    index across the three topics come from one generator call, mirroring
    the reference's aligned pin/geo/user emission.

    ``mode="hash"`` (pin topic only) switches to the portable md5-prefix
    synthesis (sources/fixtures.hash_pin_rows): the same pure-function
    replayability, but ALSO recomputable by Spark SQL and DuckDB, which
    is what lets python_datasource_clean_pins carry a value oracle."""
    if mode == "hash":
        if topic != "pin":
            raise ValueError(
                f"hash mode generates the pin topic only, got {topic!r}"
            )
        from pinterest_data_pipeline_spark.sources.fixtures import hash_pin_rows

        return hash_pin_rows(start, end)
    from pinterest_data_pipeline_spark.sources.fixtures import generate_raw_rows

    out = []
    for ind in range(start, end):
        row = generate_raw_rows(n=1, seed=seed + ind)[_TOPIC_INDEX[topic]][0]
        out.append((ind,) + tuple(row[1:]))
    return out


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class PostingEmulationReader(DataSourceReader):
    def __init__(self, options: dict):
        self.topic = options.get("topic", "pin")
        self.n = int(options.get("n", "2000"))
        self.seed = int(options.get("seed", "100"))
        self.num_partitions = int(options.get("partitions", "4"))
        self.mode = options.get("mode", "emulation")

    def partitions(self) -> list[InputPartition]:
        step = max(1, -(-self.n // self.num_partitions))
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        yield from _generate_slice(
            self.topic, partition.start, partition.end, self.seed, self.mode
        )


class PostingEmulationStreamReader(SimpleDataSourceStreamReader):
    """Offset = {"ind": next_row_index}; each micro-batch advances it by
    ``rows_per_batch`` until ``n`` rows have been emitted. Because a slice
    is a pure function of (topic, range, seed), any offset range can be
    re-read after failure — the replayability the reference's
    fire-and-forget POST loop fundamentally lacks."""

    def __init__(self, options: dict):
        self.topic = options.get("topic", "pin")
        self.n = int(options.get("n", "2000"))
        self.seed = int(options.get("seed", "100"))
        self.rows_per_batch = int(options.get("rows_per_batch", "50"))
        self.mode = options.get("mode", "emulation")

    def initialOffset(self) -> dict:
        return {"ind": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = start["ind"]
        hi = min(lo + self.rows_per_batch, self.n)
        return (
            iter(_generate_slice(self.topic, lo, hi, self.seed, self.mode)),
            {"ind": hi},
        )

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(
            _generate_slice(
                self.topic, start["ind"], end["ind"], self.seed, self.mode
            )
        )


class PostingEmulationDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "posting_emulation"

    def schema(self) -> StructType:
        return _topic_schema(self.options.get("topic", "pin"))

    def reader(self, schema: StructType) -> PostingEmulationReader:
        return PostingEmulationReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> PostingEmulationStreamReader:
        return PostingEmulationStreamReader(self.options)


def register_posting_emulation(spark) -> None:
    """Idempotently register the source on a session (required once per
    session before format("posting_emulation") resolves)."""
    spark.dataSource.register(PostingEmulationDataSource)
