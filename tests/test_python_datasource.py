"""Python Data Source (Spark 4) posting-emulation tests: executor-side
generation, partitioning-independent determinism, stream/batch equality,
and composition with the cleaning pipeline."""

from __future__ import annotations

from pinterest_data_pipeline_spark.sources.emulation_source import (
    register_posting_emulation,
)


def _load(spark, topic, n, partitions=4, seed=100):
    register_posting_emulation(spark)
    return (
        spark.read.format("posting_emulation")
        .option("topic", topic)
        .option("n", str(n))
        .option("partitions", str(partitions))
        .option("seed", str(seed))
        .load()
    )


def test_batch_rows_and_schema(spark):
    from pinterest_data_pipeline_spark.schemas import PIN_RAW

    df = _load(spark, "pin", 500)
    assert df.count() == 500
    assert df.schema == PIN_RAW
    assert df.select("index").distinct().count() == 500


def test_deterministic_across_partitionings(spark):
    """Rows are a pure function of (topic, index, seed): any partition
    count must produce the identical row set."""
    a = sorted(tuple(r) for r in _load(spark, "pin", 300, partitions=3).collect())
    b = sorted(tuple(r) for r in _load(spark, "pin", 300, partitions=7).collect())
    assert a == b


def test_stream_equals_batch(spark, tmp_path):
    """The streaming reader's union of micro-batches must equal the batch
    read of the same (topic, n, seed) — replayable offsets, no
    fire-and-forget drift."""
    register_posting_emulation(spark)
    s = (
        spark.readStream.format("posting_emulation")
        .option("topic", "geo")
        .option("n", "120")
        .option("rows_per_batch", "50")
        .load()
    )
    q = (
        s.writeStream.format("memory")
        .queryName("pe_stream_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    stream_rows = {
        tuple(r) for r in spark.sql("SELECT * FROM pe_stream_out").collect()
    }
    batch_rows = {tuple(r) for r in _load(spark, "geo", 120).collect()}
    assert stream_rows == batch_rows


def test_composes_with_cleaning(spark):
    """The registered query runs the real cleaning pipeline over the
    source: sentinel follower counts become NULL, k/M expand, and the
    aggregate is deterministic run to run."""
    import __spark_entry__ as entry_mod

    fn = entry_mod.queries()["python_datasource_clean_pins"]
    a = sorted(tuple(r) for r in fn(spark, "unused").collect())
    b = sorted(tuple(r) for r in fn(spark, "unused").collect())
    assert a == b
    assert sum(r[1] for r in a) == 1000  # n_pins sums to source n


def test_hash_mode_three_way_parity(spark):
    """mode=hash rows (executor Python, sources/fixtures.hash_pin_rows)
    equal the Spark-expression synthesis
    (pinterest_driver.pin_raw_from_spine) row for row — the identity
    that lets DuckDB replay the source and gives
    python_datasource_clean_pins its value oracle (r8 rows-only →
    oracle upgrade). Partitioning-independence holds in hash mode too,
    and non-pin topics fail loud."""
    import pytest
    from pyspark.sql import functions as F

    from pinterest_data_pipeline_spark.plans.pinterest_driver import (
        pin_raw_from_spine,
    )
    from pinterest_data_pipeline_spark.sources.fixtures import hash_pin_rows

    register_posting_emulation(spark)

    def load_hash(partitions):
        return (
            spark.read.format("posting_emulation")
            .option("topic", "pin")
            .option("n", "90")
            .option("partitions", str(partitions))
            .option("mode", "hash")
            .load()
        )

    src_rows = {tuple(r) for r in load_hash(4).collect()}
    assert src_rows == {tuple(r) for r in load_hash(7).collect()}
    spine = spark.range(0, 90).select(F.col("id").cast("int").alias("ind"))
    assert src_rows == {tuple(r) for r in pin_raw_from_spine(spine).collect()}
    assert src_rows == set(hash_pin_rows(0, 90))

    geo = (
        spark.read.format("posting_emulation")
        .option("topic", "geo")
        .option("mode", "hash")
        .option("n", "5")
        .load()
    )
    with pytest.raises(Exception, match="pin topic only"):
        geo.collect()
