"""Source builders (producers, kafka envelopes, jdbc), orchestration
retry contract, and the bucketed co-located join demonstration."""

from __future__ import annotations

import io
import contextlib
import json

import pytest
from pyspark.sql import functions as F

from pinterest_data_pipeline_spark import orchestration
from pinterest_data_pipeline_spark.schemas import GEO_RAW
from pinterest_data_pipeline_spark.sources import jdbc, kafka, producers
from pinterest_data_pipeline_spark.sources.parquet import load_table


def test_sample_rows_at_offsets(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    got = producers.sample_rows_at_offsets(orders, "o_orderkey", [0, 10, 99])
    keys = sorted(r["o_orderkey"] for r in got.collect())
    expected = [r["o_orderkey"] for r in orders.orderBy("o_orderkey").collect()]
    assert keys == [expected[0], expected[10], expected[99]]


def test_kafka_records_envelope_roundtrip(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    payloads = [
        json.loads(r["payload"])
        for r in producers.kafka_records_envelope(df).collect()
    ]
    assert all(list(p) == ["records"] for p in payloads)
    values = sorted(p["records"][0]["value"]["id"] for p in payloads)
    assert values == [1, 2]


def test_kinesis_envelope_names_own_stream(spark):
    """The reference bug (geo/user payloads naming the pin stream,
    user_posting_emulation_streaming.py:74,83,92) must NOT be present."""
    df = spark.createDataFrame([(7, "x")], "ind int, v string")
    p = json.loads(
        producers.kinesis_record_envelope(df, "streaming-geo", "ind").collect()[0][
            "payload"
        ]
    )
    assert p["StreamName"] == "streaming-geo"
    assert p["PartitionKey"] == "7"
    assert p["Data"]["ind"] == 7


def test_kafka_envelope_unenvelope_roundtrip(spark):
    rows = [(3, "Albania", 1.5, -2.5, "2020-01-01 00:00:00")]
    df = spark.createDataFrame(rows, GEO_RAW)
    enveloped = df.select(*kafka.envelope(*df.columns, key_col="ind"))
    assert enveloped.columns == ["key", "value"]
    back = kafka.unenvelope(enveloped, GEO_RAW)
    assert back.collect() == df.collect()


def test_jdbc_driver_gate(spark):
    assert jdbc.require_driver(spark) is False  # no MySQL jar in this env
    with pytest.raises(ValueError):
        jdbc.jdbc_table_reader(
            spark, "jdbc:mysql://h/db", "t", "u", "p", partition_column="id"
        )


def test_orchestration_retries():
    calls = {"n": 0}
    sleeps: list[float] = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    spec = orchestration.JobSpec(retries=2, retry_delay_s=120.0)
    assert orchestration.run_with_retries(flaky, spec, sleep=sleeps.append) == "ok"
    assert calls["n"] == 3
    assert sleeps == [120.0, 120.0]

    calls["n"] = 0
    with pytest.raises(RuntimeError):
        orchestration.run_with_retries(
            flaky, orchestration.JobSpec(retries=1, retry_delay_s=0), sleep=lambda s: None
        )


def test_bucketed_join_avoids_shuffle(spark, sf_dir):
    """Bucketing both sides on the join key ⇒ the join plan has no
    shuffle Exchange — the co-location strategy for repeated big joins at
    100 TB (SURVEY.md §7 / guide 'Partitioning & shuffle')."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
    )
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")
    )
    # force sort-merge (at test SF Spark would broadcast; at 100 TB both
    # sides are big and SMJ is what bucketing optimizes)
    joined = spark.table("b_lineitem").hint("merge").join(
        spark.table("b_orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan  # no shuffle
    assert joined.count() == li.count()


def test_rollup_merge_tree_invariance(spark, sf_dir):
    """Any merge tree over partial rollup states yields identical state:
    merging (a,b,c) at once equals merge(merge(a,b),c) equals one direct
    aggregate over the union — the property that lets a 100 TB rollup
    refresh touch only the new delta."""
    from pyspark.sql import functions as F

    from pinterest_data_pipeline_spark.operators.rollup_maintenance import (
        finalize_rollup,
        merge_rollups,
        rollup_state,
    )
    from pinterest_data_pipeline_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events")
    keys = ["event_type"]
    a = ev.filter(F.col("user_id") % 3 == 0)
    b = ev.filter(F.col("user_id") % 3 == 1)
    c = ev.filter(F.col("user_id") % 3 == 2)
    flat = merge_rollups(
        rollup_state(a, keys, "value"),
        rollup_state(b, keys, "value"),
        rollup_state(c, keys, "value"),
    )
    nested = merge_rollups(
        merge_rollups(rollup_state(a, keys, "value"), rollup_state(b, keys, "value")),
        rollup_state(c, keys, "value"),
    )
    direct = rollup_state(ev, keys, "value")
    rows = lambda df: sorted(map(tuple, finalize_rollup(df).collect()))
    assert rows(flat) == rows(nested) == rows(direct)
