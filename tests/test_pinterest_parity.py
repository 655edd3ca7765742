"""Reference-semantics parity: cleaning + Q1-Q5 over Pinterest fixtures,
cross-checked against a DuckDB oracle and explicit edge-case assertions."""

from __future__ import annotations

import duckdb
import pytest

from pinterest_data_pipeline_spark.operators import cleaning
from pinterest_data_pipeline_spark.plans import pinterest_queries as pq
from pinterest_data_pipeline_spark.schemas import GEO_RAW, PIN_RAW, USER_RAW
from pinterest_data_pipeline_spark.sources.fixtures import write_fixture_parquet
from tests import pinterest_oracle as po
from tests.oracle_utils import compare_frames


@pytest.fixture(scope="module")
def fixture_paths(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("pinterest_fixtures")
    return write_fixture_parquet(spark, str(out), n=2000, seed=100)


@pytest.fixture(scope="module")
def raw(spark, fixture_paths):
    return {name: spark.read.parquet(path) for name, path in fixture_paths.items()}


@pytest.fixture(scope="module")
def cleaned(raw):
    return {
        "pin": cleaning.clean_pin(raw["pin"]),
        "geo": cleaning.clean_geo(raw["geo"]),
        "user": cleaning.clean_user(raw["user"]),
    }


@pytest.fixture(scope="module")
def oracle_con(fixture_paths):
    con = duckdb.connect()
    for name, path in fixture_paths.items():
        con.execute(
            f'CREATE VIEW "{name}" AS SELECT * FROM read_parquet(\'{path}/*.parquet\')'
        )
    yield con
    con.close()


# ---------------------------------------------------------------- cleaning

def test_clean_pin_schema(cleaned):
    assert cleaned["pin"].columns == [
        "ind", "unique_id", "title", "description", "poster_name",
        "follower_count", "tag_list", "is_image_or_video", "image_src",
        "downloaded", "save_location", "category",
    ]
    types = dict(cleaned["pin"].dtypes)
    assert types["follower_count"] == "int"
    assert types["ind"] == "int"


def test_clean_geo_schema(cleaned):
    assert cleaned["geo"].columns == ["ind", "country", "coordinates", "timestamp"]
    types = dict(cleaned["geo"].dtypes)
    assert types["coordinates"] == "array<double>"
    assert types["timestamp"] == "timestamp"


def test_clean_user_schema(cleaned):
    assert cleaned["user"].columns == ["ind", "user_name", "age", "date_joined"]
    assert dict(cleaned["user"].dtypes)["date_joined"] == "timestamp"


def test_follower_count_km_expansion(spark):
    rows = [
        (0, "u", "t", "d", "p", "25k", "a", "image", "i", 1, "Local save in /data/x", "c"),
        (1, "u", "t", "d", "p", "6M", "a", "image", "i", 1, "Local save in /data/x", "c"),
        (2, "u", "t", "d", "p", "1.5M", "a", "image", "i", 1, "Local save in /data/x", "c"),
        (3, "u", "t", "d", "p", "942000", "a", "image", "i", 1, "Local save in /data/x", "c"),
        (4, "u", "t", "d", "p", "User Info Error", "a", "image", "i", 1, "Local save in /data/x", "c"),
    ]
    out = cleaning.clean_pin(spark.createDataFrame(rows, PIN_RAW))
    got = {r["ind"]: r["follower_count"] for r in out.collect()}
    # literal regexp composition (reference README.md:379-383):
    # "25k"→25000, "6M"→6000000, "1.5M"→"1.5000000"→NULL, sentinel→NULL
    assert got == {0: 25000, 1: 6000000, 2: None, 3: 942000, 4: None}


def test_save_location_token_and_sentinels(spark):
    rows = [
        (0, "u", "No Title Data Available", "No description available Story format",
         "User Info Error", "1k", "N,o, ,T,a,g,s, ,A,v,a,i,l,a,b,l,e",
         "image", "Image src error.", 1, "Local save in /data/travel", "travel"),
    ]
    out = cleaning.clean_pin(spark.createDataFrame(rows, PIN_RAW)).collect()[0]
    assert out["save_location"] == "/data/travel"
    assert out["title"] is None
    assert out["description"] is None
    assert out["poster_name"] is None
    assert out["tag_list"] is None
    assert out["image_src"] is None


def test_user_name_concat_no_separator(spark):
    rows = [(0, "Dylan", "Holmes", 32, "2016-10-23 14:06:51")]
    out = cleaning.clean_user(spark.createDataFrame(rows, USER_RAW)).collect()[0]
    assert out["user_name"] == "DylanHolmes"
    assert out["date_joined"].year == 2016


def test_geo_coordinates_array(spark):
    rows = [(0, "Albania", 12.5, -7.25, "2020-01-02 03:04:05")]
    out = cleaning.clean_geo(spark.createDataFrame(rows, GEO_RAW)).collect()[0]
    assert out["coordinates"] == [12.5, -7.25]


def test_age_range_boundaries(spark):
    from pinterest_data_pipeline_spark.functions.buckets import age_range, age_range_udf
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(a,) for a in [18, 24, 25, 35, 36, 50, 51, 70]], "age int")
    native = {r["age"]: r["bucket"] for r in df.withColumn("bucket", age_range("age")).collect()}
    via_udf = {r["age"]: r["bucket"] for r in df.withColumn("bucket", age_range_udf(F.col("age"))).collect()}
    expected = {18: "18-24", 24: "18-24", 25: "25-35", 35: "25-35",
                36: "36-50", 50: "36-50", 51: "+50", 70: "+50"}
    assert native == expected
    assert via_udf == expected  # UDF variant is bit-identical (README.md:553-560)


# ---------------------------------------------------------------- queries

CASES = [
    ("q1", lambda c: pq.q1_top_category_per_country(c["pin"], c["geo"]), po.Q1_SQL),
    ("q2", lambda c: pq.q2_top_category_per_year(c["pin"], c["geo"]), po.Q2_SQL),
    ("q3a", lambda c: pq.q3a_top_user_per_country(c["pin"], c["geo"], c["user"]), po.Q3A_SQL),
    ("q3b", lambda c: pq.q3b_top_country_overall(c["pin"], c["geo"], c["user"]), po.Q3B_SQL),
    ("q4", lambda c: pq.q4_top_category_per_age_group(c["pin"], c["user"]), po.Q4_SQL),
    ("q5", lambda c: pq.q5_users_joined_per_year(c["user"]), po.Q5_SQL),
    ("q5_distinct", lambda c: pq.q5_distinct_users_joined_per_year(c["user"]), po.Q5_DISTINCT_SQL),
]


@pytest.mark.parametrize("name,build,sql", CASES, ids=[c[0] for c in CASES])
def test_pinterest_query_matches_oracle(cleaned, oracle_con, name, build, sql):
    spark_pdf = build(cleaned).toPandas()
    oracle_pdf = oracle_con.execute(sql).fetchdf()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{name}: {problems}"
    assert len(spark_pdf) > 0


def test_q5_no_dedup_vs_distinct(cleaned):
    """Fixture user pool is ~N/3, so the no-dedup Q5 must overcount."""
    plain = {r["join_year"]: r["number_users_joined"]
             for r in pq.q5_users_joined_per_year(cleaned["user"]).collect()}
    distinct = {r["join_year"]: r["number_users_joined"]
                for r in pq.q5_distinct_users_joined_per_year(cleaned["user"]).collect()}
    assert sum(plain.values()) == 2000
    assert sum(distinct.values()) < sum(plain.values())
