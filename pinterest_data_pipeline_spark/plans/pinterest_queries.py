"""The five canonical analytics queries (reference README.md:449-592).

Each builder takes the CLEANED pin/geo/user DataFrames and returns a lazy
result plan. The argmax steps use the deterministic window formulation
(tie-break: value DESC, label ASC — SURVEY.md §2.5); the reference's
literal nondeterministic ``max+first`` variants live in
:mod:`pinterest_data_pipeline_spark.operators.argmax`.

Join strategy at scale: pin/geo/user are 1:1 on ``ind``; none is a small
dimension in general, so the equi-joins shuffle on ``ind`` — the same key
for every join, so Catalyst reuses the exchange across the 3-way join.
The per-(group,label) counts are partial-aggregated map-side before the
shuffle; the argmax window then runs over |groups × labels| rows, not raw
rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.functions.buckets import age_range
from pinterest_data_pipeline_spark.operators.argmax import top_per_group


def q1_top_category_per_country(pin: DataFrame, geo: DataFrame) -> DataFrame:
    """Most popular category per country (reference README.md:449-466).

    pin⋈geo on ind → count per (country, category) → window argmax.
    Output: country, category, category_count.
    """
    joined = pin.join(geo, pin["ind"] == geo["ind"], "inner")
    counts = joined.groupBy("country", "category").agg(
        F.count("category").alias("category_count")
    )
    top = top_per_group(
        counts,
        ["country"],
        [F.desc("category_count"), F.asc("category")],
    )
    return top.orderBy(F.desc("category_count"), F.asc("country")).select(
        "country", "category", "category_count"
    )


def q2_top_category_per_year(pin: DataFrame, geo: DataFrame) -> DataFrame:
    """Most popular category per post year (reference README.md:474-495).

    Output: post_year, category, category_count.
    """
    joined = pin.join(geo, pin["ind"] == geo["ind"], "inner")
    counts = (
        joined.withColumn("post_year", F.year("timestamp"))
        .groupBy("post_year", "category")
        .agg(F.count("category").alias("category_count"))
    )
    top = top_per_group(
        counts,
        ["post_year"],
        [F.desc("category_count"), F.asc("category")],
    )
    return top.orderBy(F.desc("post_year")).select(
        "post_year", "category", "category_count"
    )


def q3a_top_user_per_country(
    pin: DataFrame, geo: DataFrame, user: DataFrame
) -> DataFrame:
    """User with most followers per country (reference README.md:504-527).

    3-way join pin⋈geo⋈user on ind (geo's duplicate key dropped,
    README.md:509) → max followers per (country, user) → window argmax.
    Output: country, user_name, follower_count.
    """
    pg = pin.join(geo, pin["ind"] == geo["ind"], "inner").drop(geo["ind"])
    pgu = pg.join(user, pg["ind"] == user["ind"], "inner")
    per_user = pgu.groupBy("country", "user_name").agg(
        F.max("follower_count").alias("follower_count")
    )
    top = top_per_group(
        per_user,
        ["country"],
        [F.desc("follower_count"), F.asc("user_name")],
    )
    return top.orderBy(F.desc("follower_count"), F.asc("country")).select(
        "country", "user_name", "follower_count"
    )


def q3b_top_country_overall(
    pin: DataFrame, geo: DataFrame, user: DataFrame
) -> DataFrame:
    """Country of the single top user (reference README.md:529-533).

    Reference uses a grand ``agg(max, first)`` over Q3a's result; the
    deterministic form is the global top-1 of Q3a (tie: country ASC).
    Output: country, follower_count (1 row).
    """
    q3a = q3a_top_user_per_country(pin, geo, user)
    top = q3a.orderBy(F.desc("follower_count"), F.asc("country")).limit(1)
    return top.select("country", "follower_count")


def q4_top_category_per_age_group(pin: DataFrame, user: DataFrame) -> DataFrame:
    """Most popular category per age group (reference README.md:546-574).

    pin⋈user on ind (default inner, README.md:549) → age_range bucketing
    (native CASE WHEN; reference used a Python UDF) → count per
    (age_group, category) → window argmax.
    Output: age_group, category, category_count.
    """
    joined = pin.join(user, pin["ind"] == user["ind"], "inner")
    counts = (
        joined.withColumn("age_group", age_range("age"))
        .groupBy("age_group", "category")
        .agg(F.count("category").alias("category_count"))
    )
    top = top_per_group(
        counts,
        ["age_group"],
        [F.desc("category_count"), F.asc("category")],
    )
    return top.orderBy(F.desc("category_count"), F.asc("age_group")).select(
        "age_group", "category", "category_count"
    )


def q5_users_joined_per_year(user: DataFrame) -> DataFrame:
    """Users joined per year (reference README.md:583-592).

    Reproduces the reference's no-dedup semantics: ``df_user`` has one row
    per POSTING event, so this counts posting-user records per join-year
    (SURVEY.md §2.11 bug #1). Output: join_year, number_users_joined.
    """
    return (
        user.withColumn("join_year", F.year("date_joined"))
        .groupBy("join_year")
        .agg(F.count("user_name").alias("number_users_joined"))
        .orderBy("join_year")
        .select("join_year", "number_users_joined")
    )


def q5_distinct_users_joined_per_year(user: DataFrame) -> DataFrame:
    """Documented fix for Q5: count DISTINCT users per join-year."""
    return (
        user.withColumn("join_year", F.year("date_joined"))
        .groupBy("join_year")
        .agg(F.count_distinct("user_name").alias("number_users_joined"))
        .orderBy("join_year")
        .select("join_year", "number_users_joined")
    )
