"""Behavioral tests for the late round-2 operators: recursive CTE spine,
heavy-hitters sketch gate, and the at-least-once dedup batch twin.

(The oracle-parity sweep in test_oracle_parity.py already hash-checks all
three against DuckDB; these tests pin the behaviors the oracle can't see —
gap-month zeros on data that HAS gaps, the sketch's superset guarantee
under real skew, and duplication-factor invariance.)
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F


def test_recursive_spine_fills_gap_months_with_zero(spark, tmp_path):
    """The whole point of the spine: months with no orders must appear as
    explicit zero rows (the sf fixtures happen to have no gaps, so this
    needs a gap-bearing fixture)."""
    from pinterest_data_pipeline_spark.plans.recursive_ops import (
        recursive_month_spine,
    )

    rows = [
        (1, datetime.datetime(2020, 1, 15)),
        (2, datetime.datetime(2020, 1, 20)),
        (3, datetime.datetime(2020, 4, 2)),  # Feb + Mar are gap months
    ]
    df = spark.createDataFrame(rows, ["o_orderkey", "o_orderdate"])
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    out = {
        r["month"].strftime("%Y-%m"): r["n_orders"]
        for r in recursive_month_spine(spark, str(tmp_path)).collect()
    }
    assert out == {
        "2020-01": 2,
        "2020-02": 0,
        "2020-03": 0,
        "2020-04": 1,
    }


def test_freq_items_sketch_contains_every_exact_heavy_hitter(spark):
    """The Karp/Shenker/Papadimitriou guarantee: items above the support
    threshold are NEVER missed (false positives allowed, false negatives
    not). Pin it on a skewed stream where one key is 50%+."""
    rows = [("hot",)] * 600 + [("warm",)] * 250 + [(f"cold{i}",) for i in range(150)]
    df = spark.createDataFrame(rows, ["k"]).repartition(8)

    sketch = set(df.stat.freqItems(["k"], 0.2).collect()[0]["k_freqItems"])
    n = len(rows)
    exact_heavy = {
        r["k"]
        for r in df.groupBy("k").count().where(F.col("count") > 0.2 * n).collect()
    }
    assert exact_heavy == {"hot", "warm"}
    assert exact_heavy <= sketch


@pytest.mark.parametrize("copies", [2, 3, 5])
def test_stream_dedup_batch_invariant_to_duplication_factor(spark, copies):
    """Exactly-once restoration must not depend on HOW duplicated the
    at-least-once delivery was: k copies of every event dedup back to the
    same per-type counts for any k."""
    rows = [(i, "click" if i % 2 else "view") for i in range(40)]
    ev = spark.createDataFrame(rows, ["event_id", "event_type"])
    dup = ev
    for _ in range(copies - 1):
        dup = dup.unionAll(ev)

    got = {
        r["event_type"]: r["n_unique"]
        for r in dup.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_unique"))
        .collect()
    }
    assert got == {"click": 20, "view": 20}
