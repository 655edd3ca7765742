"""Property-based tests (hypothesis) for the cleaning contract.

The example-based tests pin the known dirty shapes; these pin the
TRANSFORM LAWS over arbitrary inputs: follower-count expansion matches a
Python model of the reference's literal regexp composition, age
bucketing matches its boundary spec for any int, and cleaning is
deterministic (same input → same output)."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pinterest_data_pipeline_spark.schemas import PIN_RAW

# Model of the reference's literal cleaning (README.md:371-383): sentinel
# check happens BEFORE expansion; replacement is substring-global.
SENTINELS = {
    "No description available Story format", "User Info Error",
    "Image src error.", "N,o, ,T,a,g,s, ,A,v,a,i,l,a,b,l,e",
    "No Title Data Available",
}


# Spark's cast path (UTF8String.trimAll) strips leading/trailing whitespace
# and ISO-control characters before parsing; for the ASCII alphabet used
# below that is 0x00-0x20 plus 0x7F. toInt also accepts an optional sign.
_CAST_TRIM = "".join(chr(c) for c in list(range(0x21)) + [0x7F])


def model_follower_count(raw: str | None) -> int | None:
    if raw is None or raw in SENTINELS:
        return None
    expanded = raw.replace("k", "000").replace("M", "000000")
    expanded = expanded.strip(_CAST_TRIM)
    if re.fullmatch(r"[+-]?\d+", expanded):
        v = int(expanded)
        if -(2**31) <= v < 2**31:
            return v
    return None


def model_age_range(age: int | None) -> str | None:
    if age is None:
        return None
    if age < 25:
        return "18-24"
    if age <= 35:
        return "25-35"
    if age <= 50:
        return "36-50"
    return "+50"


follower_strings = st.one_of(
    st.from_regex(r"[0-9]{1,6}", fullmatch=True),
    st.from_regex(r"[0-9]{1,3}k", fullmatch=True),
    st.from_regex(r"[0-9]{1,2}M", fullmatch=True),
    st.from_regex(r"[0-9]{1,2}\.[0-9]M", fullmatch=True),
    st.sampled_from(sorted(SENTINELS)),
    st.text(
        alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
        max_size=12,
    ),
)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(follower_strings, min_size=1, max_size=40))
def test_follower_expansion_matches_model(spark, raw_values):
    from pinterest_data_pipeline_spark.operators.cleaning import (
        expand_follower_count, null_out_sentinels,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(raw_values)], "i int, follower_count string"
    )
    out = expand_follower_count(null_out_sentinels(df))
    got = {r["i"]: r["follower_count"] for r in out.collect()}
    expected = {i: model_follower_count(v) for i, v in enumerate(raw_values)}
    assert got == expected


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.one_of(st.none(), st.integers(-5, 120)), min_size=1, max_size=40))
def test_age_range_matches_model(spark, ages):
    from pyspark.sql import functions as F

    from pinterest_data_pipeline_spark.functions.buckets import age_range

    df = spark.createDataFrame([(i, a) for i, a in enumerate(ages)], "i int, age int")
    got = {
        r["i"]: r["bucket"]
        for r in df.withColumn("bucket", age_range("age")).collect()
    }
    assert got == {i: model_age_range(a) for i, a in enumerate(ages)}


def test_quarantine_nonfinite_nulls_nan_and_infinities_only(spark):
    from pyspark.sql import functions as F

    from pinterest_data_pipeline_spark.operators.cleaning import (
        quarantine_nonfinite,
    )

    vals = [
        (0, 1.25),
        (1, float("nan")),
        (2, float("inf")),
        (3, float("-inf")),
        (4, 0.0),
        (5, -99.5),
        (6, None),
        (7, 1.7976931348623157e308),  # finite DBL_MAX survives
    ]
    df = spark.createDataFrame(vals, "i int, v double").withColumn(
        "s", F.lit("x")
    )
    q = quarantine_nonfinite(df)
    out = {r["i"]: r["v"] for r in q.collect()}
    assert out[0] == 1.25
    assert out[1] is None and out[2] is None and out[3] is None
    assert out[4] == 0.0 and out[5] == -99.5
    assert out[6] is None
    assert out[7] == 1.7976931348623157e308
    # string columns untouched (double/float only by default)
    assert all(r["s"] == "x" for r in q.select("s").collect())
    # the quarantined frame survives the ANSI integer-cents money path
    # that a raw Infinity kills with CAST_OVERFLOW (DBL_MAX excluded:
    # it is FINITE, so quarantine rightly keeps it, and *100 overflows
    # — range enforcement is a schema contract, not this operator's)
    cents = q.filter(F.col("i") != 7).select(
        F.round(F.col("v") * 100).cast("bigint").alias("c")
    ).collect()
    assert {r["c"] for r in cents} >= {125, 0, -9950, None}
