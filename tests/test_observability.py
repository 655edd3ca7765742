"""df.observe quality metrics: collected on the same pass as the action,
correct values, no extra scan in the plan."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.operators.observability import (
    quality_observation,
)
from pinterest_data_pipeline_spark.sources.parquet import load_table


def test_observation_values_match_direct_aggregates(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    instrumented, obs = quality_observation(
        cust,
        not_null=["c_name", "c_acctbal"],
        bounds={"c_acctbal": (-999.99, 9999.99)},
    )
    # the action that "pays" for the metrics is an ordinary aggregate
    out = instrumented.agg(F.count(F.lit(1)).alias("n")).collect()[0]["n"]

    expected = cust.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("c_name").isNull(), True)).alias("c_name_nulls"),
        F.count(F.when(F.col("c_acctbal").isNull(), True)).alias(
            "c_acctbal_nulls"
        ),
        F.count(
            F.when(
                (F.col("c_acctbal") < -999.99) | (F.col("c_acctbal") > 9999.99),
                True,
            )
        ).alias("c_acctbal_oob"),
    ).collect()[0]

    got = obs.get
    assert got["n_rows"] == out == expected["n_rows"]
    assert got["c_name_nulls"] == expected["c_name_nulls"]
    assert got["c_acctbal_nulls"] == expected["c_acctbal_nulls"]
    assert got["c_acctbal_oob"] == expected["c_acctbal_oob"]


def test_observation_adds_no_extra_scan(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    instrumented, _obs = quality_observation(cust, not_null=["c_name"])
    plan_df = instrumented.groupBy("c_mktsegment").count()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    text = buf.getvalue()
    assert text.count("InMemoryFileIndex") == 1  # one scan only
    assert "CollectMetrics" in text
