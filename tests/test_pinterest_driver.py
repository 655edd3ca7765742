"""Behavioral pinning for the driver-matrix Pinterest fixture synthesis
(plans/pinterest_driver.py): the hash-regenerated raw tables must carry
the same dirty-value contract as the reference wire format (FIXTURES.md
§A) — exact sentinel bytes, the full follower_count value universe
including the "1.5M"→NULL edge, 4-token save_locations, the age-bucket
boundary values, and Q5-observable user repetition — and the production
cleaning path must resolve each dirty class exactly as the reference
does. (Value-level parity vs DuckDB is covered by the registered
oracles; these tests pin the DISTRIBUTIONS the oracles can't see.)
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.operators.cleaning import SENTINELS
from pinterest_data_pipeline_spark.plans.pinterest_driver import (
    BOUNDARY_AGES,
    USER_POOL,
    cleaned_fixture_tables,
    raw_fixture_tables,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def raw(spark):
    pin, geo, user = raw_fixture_tables(spark, SF)
    return {"pin": pin.cache(), "geo": geo.cache(), "user": user.cache()}


@pytest.fixture(scope="module")
def cleaned(spark):
    return cleaned_fixture_tables(spark, SF)


def test_tables_are_one_to_one_on_ind(raw):
    n = raw["pin"].count()
    assert n > 0
    assert raw["geo"].count() == n
    assert raw["user"].count() == n
    assert raw["pin"].select("index").distinct().count() == n
    joined = raw["pin"].join(
        raw["geo"], raw["pin"]["index"] == raw["geo"]["ind"]
    )
    assert joined.count() == n


def test_follower_count_value_universe(raw):
    """Every raw follower_count is exactly one of the five dirty classes,
    and each class actually occurs (the cleaning stress test needs all
    of them present)."""
    vals = [r[0] for r in raw["pin"].select("follower_count").collect()]
    classes = {"sentinel": 0, "decimal_m": 0, "k": 0, "m": 0, "digits": 0}
    for v in vals:
        if v == "User Info Error":
            classes["sentinel"] += 1
        elif re.fullmatch(r"[1-3]\.5M", v):
            classes["decimal_m"] += 1
        elif re.fullmatch(r"[0-9]{1,3}k", v):
            classes["k"] += 1
        elif re.fullmatch(r"[1-9]M", v):
            classes["m"] += 1
        elif re.fullmatch(r"[0-9]{1,6}", v):
            classes["digits"] += 1
        else:
            raise AssertionError(f"unexpected follower_count: {v!r}")
    assert all(n > 0 for n in classes.values()), classes
    n = len(vals)
    # hash buckets target 3/2/30/10/55 of 100 — allow generous slack
    assert classes["sentinel"] / n < 0.08
    assert classes["decimal_m"] / n < 0.07
    assert 0.15 < classes["k"] / n < 0.45


def test_sentinels_are_byte_exact(raw):
    """The five sentinel strings must match operators/cleaning.SENTINELS
    verbatim — na.replace is exact-match."""
    seen = set()
    for col in ["title", "description", "poster_name", "tag_list",
                "image_src", "follower_count"]:
        for (v,) in (
            raw["pin"].select(col).filter(F.col(col).isin(SENTINELS))
            .distinct().collect()
        ):
            seen.add(v)
    # title/desc/user/img/tags sentinels all occur somewhere in pin
    assert seen == set(SENTINELS)


def test_save_location_is_four_tokens(raw):
    bad = raw["pin"].filter(
        F.size(F.split(F.col("save_location"), " ")) != 4
    )
    assert bad.count() == 0


def test_cleaning_resolves_each_dirty_class(raw, cleaned):
    """Join raw→clean on ind and check the reference cleaning contract
    per dirty class: sentinel→NULL, 'N.5M'→NULL (the preserved bug),
    k/M→expanded int, digits→int."""
    joined = (
        raw["pin"]
        .select(F.col("index").alias("ind"), F.col("follower_count").alias("raw_fc"))
        .join(cleaned["pin"].select("ind", "follower_count"), "ind")
    )
    rows = joined.collect()
    assert rows
    for r in rows:
        raw_fc, got = r["raw_fc"], r["follower_count"]
        if raw_fc == "User Info Error" or raw_fc.endswith(".5M"):
            assert got is None, (raw_fc, got)
        elif raw_fc.endswith("k"):
            assert got == int(raw_fc[:-1]) * 1000
        elif raw_fc.endswith("M"):
            assert got == int(raw_fc[:-1]) * 1000000
        else:
            assert got == int(raw_fc)


def test_boundary_ages_present_and_bucketed(cleaned):
    """uid 0..5 pin the age_range UDF boundary values 24/25/35/36/50/51
    (reference README.md:553-556); at any driver SF the orders spine
    covers those residues mod USER_POOL."""
    ages = {
        r["age"] for r in cleaned["user"].select("age").distinct().collect()
    }
    assert set(BOUNDARY_AGES) <= ages
    assert all(18 <= a <= 70 for a in ages)


def test_q5_user_pool_repeats(cleaned):
    """uid = ind % USER_POOL repeats users across posting rows, so Q5's
    no-dedup overcount is observable (reference bug #1)."""
    n_rows = cleaned["user"].count()
    n_users = cleaned["user"].select("user_name", "date_joined").distinct().count()
    assert n_users <= USER_POOL
    assert n_rows > n_users


def test_cleaned_schemas_match_reference(cleaned):
    assert dict(cleaned["pin"].dtypes)["follower_count"] == "int"
    assert cleaned["geo"].columns == ["ind", "country", "coordinates", "timestamp"]
    assert dict(cleaned["geo"].dtypes)["timestamp"] == "timestamp"
    assert cleaned["user"].columns == ["ind", "user_name", "age", "date_joined"]


def test_geo_timestamps_parse_and_span_years(cleaned):
    years = (
        cleaned["geo"]
        .select(F.year("timestamp").alias("y"))
        .agg(F.min("y").alias("lo"), F.max("y").alias("hi"))
        .collect()[0]
    )
    assert years["lo"] >= 2017 and years["hi"] <= 2022
    assert years["hi"] > years["lo"]  # multiple post-years for Q2
    assert (
        cleaned["geo"].filter(F.col("timestamp").isNull()).count() == 0
    )  # every generated wire string must parse


def test_portable_hash_identity_cross_engine(spark):
    """The foundation under every pinterest_driver oracle: Spark's
    conv(substr(md5(tag||ind),1,8),16,10) must equal DuckDB's
    CAST(concat('0x', substr(md5(tag||ind),1,8)) AS BIGINT) for every
    (tag, ind) — pinned directly over a 1000-ind spine and all the tags
    the synthesis uses, not just transitively via the query hashes."""
    import duckdb

    from pinterest_data_pipeline_spark.plans.pinterest_driver import (
        _h,
        _h_sql,
    )
    from pyspark.sql import functions as F

    tags = ["cat", "fc", "fcd", "fck", "fcm", "fcv", "title", "desc",
            "poster", "tags", "img", "dl", "iv", "country", "lat", "lon",
            "gy", "gmo", "gd", "gh", "gmi", "gs", "ufn", "uln", "age",
            "uy", "umo", "ud", "uh", "umi", "us"]
    spine = spark.range(1000).select(F.col("id").cast("int").alias("ind"))
    got = spine.select(
        "ind", *[_h(t, F.col("ind")).alias(f"h_{i}") for i, t in enumerate(tags)]
    ).orderBy("ind").collect()
    con = duckdb.connect()
    exprs = ", ".join(f"{_h_sql(t, 'ind')} AS h_{i}" for i, t in enumerate(tags))
    want = con.execute(
        f"SELECT ind, {exprs} FROM (SELECT unnest(range(0, 1000)) AS ind) "
        "ORDER BY ind"
    ).fetchall()
    con.close()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
