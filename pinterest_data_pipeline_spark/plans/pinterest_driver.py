"""Driver-registered Pinterest parity queries (round 5).

The reference's flagship surface — raw pin/geo/user ingestion, the full
cleaning contract (reference README.md:371-440), and the five canonical
queries (README.md:449-592) — previously earned driver correctness rows
only through ANALOG shapes over the driver's TPC-H-ish tables, because
the driver's ``sf_dir`` carries no pin/geo/user parquet (the exact-
semantics run lived in tests/test_pinterest_parity.py over generated
fixtures).

This module closes that gap WITHOUT shipping fixture files: the raw
pin/geo/user tables are derived deterministically from the driver's own
``orders`` table with the repo's portable md5 hash (the same
``conv(substr(md5(x),1,8),16,10)`` ≡ DuckDB
``CAST(concat('0x', substr(md5(x),1,8)) AS BIGINT)`` identity every LSH
oracle here uses), so BOTH engines regenerate byte-identical dirty
inputs — the five sentinel strings, k/M/"1.5M" follower counts, 4-token
save_locations, wire-format timestamp strings, a 512-user pool with the
age-bucket boundary values — and then replay cleaning + query
end-to-end. The Spark side runs the REAL production path
(operators/cleaning.clean_pin/clean_geo/clean_user +
plans/pinterest_queries builders); only the fixture synthesis is local
to this module.

One deliberate oracle-side divergence from tests/pinterest_oracle.py:
the follower_count cast is guarded by an integer regex, because DuckDB
``TRY_CAST('1.5000000' AS INTEGER)`` ROUNDS to 2 while Spark
``try_cast`` yields NULL (the reference's preserved "1.5M"→NULL edge,
README.md:379-383). The guard makes the oracle reproduce Spark's ANSI
try_cast exactly on this generator's value universe (digits-only or
decimal-suffixed strings only).

Scale: fixture synthesis is a zero-shuffle expression scan over the
spine; the queries themselves keep the production plan shape — all
joins share the ``ind`` key so the exchange is reused across the 3-way
join, counts partial-aggregate map-side, and the argmax runs over
|groups × labels| rows (plans/pinterest_queries module docstring).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.plans import pinterest_queries as pq
from pinterest_data_pipeline_spark.plans.registry import register
from pinterest_data_pipeline_spark.operators import cleaning
from pinterest_data_pipeline_spark.sources.fixtures import (
    CATEGORIES,
    COUNTRIES,
    FIRST_NAMES,
    LAST_NAMES,
    SENTINEL_DESC,
    SENTINEL_IMG,
    SENTINEL_TAGS,
    SENTINEL_TITLE,
    SENTINEL_USER,
)
from pinterest_data_pipeline_spark.sources.parquet import load_table

USER_POOL = 512  # fixed user-pool size: uid = ind % USER_POOL, so Q5's
#                  no-dedup overcount is observable at every driver SF
BOUNDARY_AGES = [24, 25, 35, 36, 50, 51]  # age_range UDF boundaries
#                  (reference README.md:553-556), pinned to uid 0..5


# ------------------------------------------------------- portable hash

def _h(tag: str, seed: Column) -> Column:
    """Deterministic 32-bit hash of (tag, seed) — Spark side."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(tag), seed.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def _h_sql(tag: str, seed: str) -> str:
    """The same hash in DuckDB SQL (seed is an integer-typed expr)."""
    return (
        f"CAST(concat('0x', substr(md5(concat('{tag}', "
        f"CAST({seed} AS VARCHAR))), 1, 8)) AS BIGINT)"
    )


def _pick(pool: list[str], tag: str, seed: Column) -> Column:
    """pool[h % len] — Spark side (element_at is 1-based)."""
    idx = (_h(tag, seed) % F.lit(len(pool)) + 1).cast("int")
    return F.element_at(F.array(*[F.lit(v) for v in pool]), idx)


def _pick_sql(pool: list[str], tag: str, seed: str) -> str:
    lit = "[" + ", ".join(f"'{v}'" for v in pool) + "]"
    return f"list_extract({lit}, CAST({_h_sql(tag, seed)} % {len(pool)} + 1 AS INTEGER))"


def _wire_ts(prefix: str, base_year: int, span_years: int, seed: Column) -> Column:
    """'YYYY-MM-DD HH:MM:SS' built digit-by-digit from hash fields — no
    engine date math, so there is no timezone or calendar surface at all
    (day capped at 28)."""
    def pad2(c: Column) -> Column:
        return F.lpad(c.cast("string"), 2, "0")

    return F.concat(
        (F.lit(base_year) + _h(prefix + "y", seed) % span_years).cast("string"),
        F.lit("-"), pad2(_h(prefix + "mo", seed) % 12 + 1),
        F.lit("-"), pad2(_h(prefix + "d", seed) % 28 + 1),
        F.lit(" "), pad2(_h(prefix + "h", seed) % 24),
        F.lit(":"), pad2(_h(prefix + "mi", seed) % 60),
        F.lit(":"), pad2(_h(prefix + "s", seed) % 60),
    )


def _wire_ts_sql(prefix: str, base_year: int, span_years: int, seed: str) -> str:
    def pad2(expr: str) -> str:
        return f"lpad(CAST({expr} AS VARCHAR), 2, '0')"

    return (
        f"concat(CAST({base_year} + {_h_sql(prefix + 'y', seed)} % {span_years} AS VARCHAR),"
        f" '-', {pad2(_h_sql(prefix + 'mo', seed) + ' % 12 + 1')},"
        f" '-', {pad2(_h_sql(prefix + 'd', seed) + ' % 28 + 1')},"
        f" ' ', {pad2(_h_sql(prefix + 'h', seed) + ' % 24')},"
        f" ':', {pad2(_h_sql(prefix + 'mi', seed) + ' % 60')},"
        f" ':', {pad2(_h_sql(prefix + 's', seed) + ' % 60')})"
    )


# -------------------------------------------------- raw fixture tables

def raw_fixture_tables(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Dirty pin/geo/user raw tables (FIXTURES.md §A wire schemas),
    derived 1:1 from the orders spine (``ind = o_orderkey``)."""
    from pinterest_data_pipeline_spark.operators.parallel import fan_out

    # fan_out BEFORE the synthesis projections: all three raw tables
    # hang ~10-40 md5 expressions per row off this spine, and the
    # orders scan is a single split — without the exchange the whole
    # dirty-fixture synthesis (and the cleaning stack above it) runs in
    # ONE task per table (operators/parallel rationale; guide §2.5).
    spine = fan_out(
        load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").cast("int").alias("ind")
        )
    )
    pin = pin_raw_from_spine(spine)
    ind = F.col("ind")
    geo = spine.select(
        ind,
        _pick(COUNTRIES, "country", ind).alias("country"),
        ((_h("lat", ind) % 18000).cast("double") / 100 - 90).alias("latitude"),
        ((_h("lon", ind) % 36000).cast("double") / 100 - 180).alias("longitude"),
        _wire_ts("g", 2017, 6, ind).alias("timestamp"),
    )
    uid = ind % USER_POOL
    boundary = F.element_at(
        F.array(*[F.lit(a) for a in BOUNDARY_AGES]), (uid + 1).cast("int")
    )
    user = spine.select(
        ind,
        _pick(FIRST_NAMES, "ufn", uid).alias("first_name"),
        _pick(LAST_NAMES, "uln", uid).alias("last_name"),
        F.when(uid < len(BOUNDARY_AGES), boundary)
        .otherwise((_h("age", uid) % 53 + 18).cast("int"))
        .cast("int")
        .alias("age"),
        _wire_ts("u", 2015, 3, uid).alias("date_joined"),
    )
    return pin, geo, user


def pin_raw_from_spine(spine: DataFrame) -> DataFrame:
    """The dirty PIN_RAW synthesis over any ``ind`` spine — factored out
    so the Python Data Source's hash mode
    (sources/emulation_source.py, sources/fixtures.hash_pin_rows) can be
    pinned field-for-field against the same expressions
    (tests/test_python_datasource.py)."""
    ind = F.col("ind")
    category = _pick(CATEGORIES, "cat", ind)
    fc_bucket = _h("fc", ind) % 100
    return spine.select(
        ind.alias("index"),
        F.concat(F.lit("uid-"), F.md5(ind.cast("string"))).alias("unique_id"),
        F.when(_h("title", ind) % 100 < 5, F.lit(SENTINEL_TITLE))
        .otherwise(F.concat(F.lit("Title "), ind.cast("string")))
        .alias("title"),
        F.when(_h("desc", ind) % 100 < 5, F.lit(SENTINEL_DESC))
        .otherwise(F.concat(F.lit("A post about "), category))
        .alias("description"),
        F.when(_h("poster", ind) % 100 < 3, F.lit(SENTINEL_USER))
        .otherwise(
            F.concat(_pick(FIRST_NAMES, "pfn", ind), F.lit(" "),
                     _pick(LAST_NAMES, "pln", ind))
        )
        .alias("poster_name"),
        F.when(fc_bucket < 3, F.lit(SENTINEL_USER))
        .when(
            fc_bucket < 5,
            F.concat((_h("fcd", ind) % 3 + 1).cast("string"), F.lit(".5M")),
        )
        .when(
            fc_bucket < 35,
            F.concat((_h("fck", ind) % 999 + 1).cast("string"), F.lit("k")),
        )
        .when(
            fc_bucket < 45,
            F.concat((_h("fcm", ind) % 9 + 1).cast("string"), F.lit("M")),
        )
        .otherwise((_h("fcv", ind) % 1000000).cast("string"))
        .alias("follower_count"),
        F.when(_h("tags", ind) % 100 < 5, F.lit(SENTINEL_TAGS))
        .otherwise(
            F.concat_ws(",", _pick(CATEGORIES, "tg1", ind),
                        _pick(CATEGORIES, "tg2", ind))
        )
        .alias("tag_list"),
        _pick(
            ["image", "video", "multi-video(story page format)"], "iv", ind
        ).alias("is_image_or_video"),
        F.when(_h("img", ind) % 100 < 3, F.lit(SENTINEL_IMG))
        .otherwise(
            F.concat(F.lit("https://i.pinimg.com/"), ind.cast("string"),
                     F.lit(".jpg"))
        )
        .alias("image_src"),
        (_h("dl", ind) % 2).cast("int").alias("downloaded"),
        F.concat(F.lit("Local save in /data/"), category).alias("save_location"),
        category.alias("category"),
    )


def cleaned_fixture_tables(
    spark: SparkSession, sf_dir: str
) -> dict[str, DataFrame]:
    """The production cleaning path over the synthesized raw tables."""
    pin, geo, user = raw_fixture_tables(spark, sf_dir)
    return {
        "pin": cleaning.clean_pin(pin),
        "geo": cleaning.clean_geo(geo),
        "user": cleaning.clean_user(user),
    }


# ------------------------------------------------------- oracle raw SQL

def _sentinel_sql(base: str) -> str:
    sentinels = ", ".join(
        f"'{s}'"
        for s in [SENTINEL_DESC, SENTINEL_USER, SENTINEL_IMG,
                  SENTINEL_TAGS, SENTINEL_TITLE]
    )
    return f"CASE WHEN {base} IN ({sentinels}) THEN NULL ELSE {base} END"


ORDERS_SPINE_SQL = "SELECT CAST(o_orderkey AS INTEGER) AS ind FROM orders"


def _raw_ctes(spine_sql: str = ORDERS_SPINE_SQL) -> str:
    """DuckDB CTEs regenerating the identical raw fixture tables over
    ``spine_sql`` (default: the driver's orders spine; the Python Data
    Source gate passes a literal range)."""
    ind = "ind"
    cat = _pick_sql(CATEGORIES, "cat", ind)
    fcb = f"{_h_sql('fc', ind)} % 100"
    iv = _pick_sql(
        ["image", "video", "multi-video(story page format)"], "iv", ind
    )
    uid = f"(ind % {USER_POOL})"
    ages = "[" + ", ".join(str(a) for a in BOUNDARY_AGES) + "]"
    return f"""
    spine AS ({spine_sql}),
    pin_raw AS (
        SELECT ind AS "index",
            concat('uid-', md5(CAST(ind AS VARCHAR))) AS unique_id,
            CASE WHEN {_h_sql('title', ind)} % 100 < 5
                 THEN '{SENTINEL_TITLE}'
                 ELSE concat('Title ', CAST(ind AS VARCHAR)) END AS title,
            CASE WHEN {_h_sql('desc', ind)} % 100 < 5
                 THEN '{SENTINEL_DESC}'
                 ELSE concat('A post about ', {cat}) END AS description,
            CASE WHEN {_h_sql('poster', ind)} % 100 < 3
                 THEN '{SENTINEL_USER}'
                 ELSE concat({_pick_sql(FIRST_NAMES, 'pfn', ind)}, ' ',
                             {_pick_sql(LAST_NAMES, 'pln', ind)})
                 END AS poster_name,
            CASE WHEN {fcb} < 3 THEN '{SENTINEL_USER}'
                 WHEN {fcb} < 5 THEN concat(
                     CAST({_h_sql('fcd', ind)} % 3 + 1 AS VARCHAR), '.5M')
                 WHEN {fcb} < 35 THEN concat(
                     CAST({_h_sql('fck', ind)} % 999 + 1 AS VARCHAR), 'k')
                 WHEN {fcb} < 45 THEN concat(
                     CAST({_h_sql('fcm', ind)} % 9 + 1 AS VARCHAR), 'M')
                 ELSE CAST({_h_sql('fcv', ind)} % 1000000 AS VARCHAR)
                 END AS follower_count,
            CASE WHEN {_h_sql('tags', ind)} % 100 < 5
                 THEN '{SENTINEL_TAGS}'
                 ELSE concat({_pick_sql(CATEGORIES, 'tg1', ind)}, ',',
                             {_pick_sql(CATEGORIES, 'tg2', ind)})
                 END AS tag_list,
            {iv} AS is_image_or_video,
            CASE WHEN {_h_sql('img', ind)} % 100 < 3
                 THEN '{SENTINEL_IMG}'
                 ELSE concat('https://i.pinimg.com/',
                             CAST(ind AS VARCHAR), '.jpg') END AS image_src,
            CAST({_h_sql('dl', ind)} % 2 AS INTEGER) AS downloaded,
            concat('Local save in /data/', {cat}) AS save_location,
            {cat} AS category
        FROM spine
    ),
    geo_raw AS (
        SELECT ind,
            {_pick_sql(COUNTRIES, 'country', ind)} AS country,
            CAST({_h_sql('lat', ind)} % 18000 AS DOUBLE) / 100 - 90
                AS latitude,
            CAST({_h_sql('lon', ind)} % 36000 AS DOUBLE) / 100 - 180
                AS longitude,
            {_wire_ts_sql('g', 2017, 6, ind)} AS "timestamp"
        FROM spine
    ),
    user_raw AS (
        SELECT ind,
            {_pick_sql(FIRST_NAMES, 'ufn', uid)} AS first_name,
            {_pick_sql(LAST_NAMES, 'uln', uid)} AS last_name,
            CASE WHEN {uid} < {len(BOUNDARY_AGES)}
                 THEN list_extract({ages}, CAST({uid} + 1 AS INTEGER))
                 ELSE CAST({_h_sql('age', uid)} % 53 + 18 AS INTEGER)
                 END AS age,
            {_wire_ts_sql('u', 2015, 3, uid)} AS date_joined
        FROM spine
    )"""


def _clean_ctes() -> str:
    """DuckDB CTEs replaying operators/cleaning over the raw CTEs.

    The follower_count cast is regex-guarded: Spark ANSI try_cast yields
    NULL for '1.5000000' while DuckDB TRY_CAST ROUNDS it to 2, so a bare
    TRY_CAST would diverge on exactly the "1.5M" rows the reference's
    preserved cleaning bug is about."""
    fc = (
        "replace(replace("
        + _sentinel_sql("follower_count")
        + ", 'k', '000'), 'M', '000000')"
    )
    # Spark's null_out_sentinels is na.replace over ALL string columns,
    # so every string column gets the sentinel CASE — including ones
    # this generator never makes dirty (unique_id, is_image_or_video,
    # save_location, category). Mirroring the full semantics keeps the
    # oracle correct under any future generator change instead of
    # relying on "never emits a sentinel there". (tests/
    # pinterest_oracle.py CLEAN_CTES is the fixture-file twin of this
    # replay — cleaning-contract changes must land in both.)
    return f"""
    pin_clean AS (
        SELECT "index" AS ind,
            {_sentinel_sql('unique_id')} AS unique_id,
            {_sentinel_sql('title')} AS title,
            {_sentinel_sql('description')} AS description,
            {_sentinel_sql('poster_name')} AS poster_name,
            CASE WHEN regexp_matches({fc}, '^[0-9]+$')
                 THEN CAST({fc} AS INTEGER) ELSE NULL END AS follower_count,
            {_sentinel_sql('tag_list')} AS tag_list,
            {_sentinel_sql('is_image_or_video')} AS is_image_or_video,
            {_sentinel_sql('image_src')} AS image_src,
            downloaded,
            split_part({_sentinel_sql('save_location')}, ' ', 4)
                AS save_location,
            {_sentinel_sql('category')} AS category
        FROM pin_raw
    ),
    geo_clean AS (
        SELECT ind, country, [latitude, longitude] AS coordinates,
               CAST("timestamp" AS TIMESTAMP) AS "timestamp"
        FROM geo_raw
    ),
    user_clean AS (
        SELECT ind, concat(first_name, last_name) AS user_name, age,
               CAST(date_joined AS TIMESTAMP) AS date_joined
        FROM user_raw
    )"""


def _fixture_prefix(spine_sql: str = ORDERS_SPINE_SQL) -> str:
    return f"WITH {_raw_ctes(spine_sql)}, {_clean_ctes()}"


# ------------------------------------------------------------- queries

@register(
    "pinterest_q1_top_category_per_country",
    oracle=f"""
    {_fixture_prefix()},
    counts AS (
        SELECT g.country, p.category,
               CAST(COUNT(p.category) AS BIGINT) AS category_count
        FROM pin_clean p JOIN geo_clean g ON p.ind = g.ind
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT country, category, category_count,
               ROW_NUMBER() OVER (PARTITION BY country
                   ORDER BY category_count DESC, category ASC) AS rn
        FROM counts
    )
    SELECT country, category, category_count FROM ranked WHERE rn = 1
    """,
)
def pinterest_q1_top_category_per_country(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reference Q1 (README.md:449-466) end-to-end over the regenerated
    dirty fixtures: raw synthesis → clean_pin/clean_geo → pin⋈geo on ind
    → count per (country, category) → deterministic window argmax."""
    c = cleaned_fixture_tables(spark, sf_dir)
    return pq.q1_top_category_per_country(c["pin"], c["geo"])


@register(
    "pinterest_q2_top_category_per_year",
    oracle=f"""
    {_fixture_prefix()},
    counts AS (
        SELECT CAST(year(g."timestamp") AS INTEGER) AS post_year,
               p.category,
               CAST(COUNT(p.category) AS BIGINT) AS category_count
        FROM pin_clean p JOIN geo_clean g ON p.ind = g.ind
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT post_year, category, category_count,
               ROW_NUMBER() OVER (PARTITION BY post_year
                   ORDER BY category_count DESC, category ASC) AS rn
        FROM counts
    )
    SELECT post_year, category, category_count FROM ranked WHERE rn = 1
    """,
)
def pinterest_q2_top_category_per_year(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reference Q2 (README.md:474-495): most popular category per post
    year, over the cleaned regenerated fixtures."""
    c = cleaned_fixture_tables(spark, sf_dir)
    return pq.q2_top_category_per_year(c["pin"], c["geo"])


@register(
    "pinterest_q3_top_user_per_country",
    oracle=f"""
    {_fixture_prefix()},
    per_user AS (
        SELECT g.country, u.user_name,
               MAX(p.follower_count) AS follower_count
        FROM pin_clean p
        JOIN geo_clean g ON p.ind = g.ind
        JOIN user_clean u ON p.ind = u.ind
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT country, user_name, follower_count,
               ROW_NUMBER() OVER (PARTITION BY country
                   ORDER BY follower_count DESC, user_name ASC) AS rn
        FROM per_user
    )
    SELECT country, user_name, follower_count FROM ranked WHERE rn = 1
    """,
)
def pinterest_q3_top_user_per_country(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reference Q3 (README.md:504-527): user with most followers per
    country — the 3-way pin⋈geo⋈user join (geo's duplicate key dropped),
    max-per-user then window argmax. The flagship benchmarked shape."""
    c = cleaned_fixture_tables(spark, sf_dir)
    return pq.q3a_top_user_per_country(c["pin"], c["geo"], c["user"])


@register(
    "pinterest_q4_top_category_per_age_group",
    oracle=f"""
    {_fixture_prefix()},
    bucketed AS (
        SELECT CASE WHEN u.age IS NULL THEN NULL
                    WHEN u.age < 25 THEN '18-24'
                    WHEN u.age BETWEEN 25 AND 35 THEN '25-35'
                    WHEN u.age BETWEEN 36 AND 50 THEN '36-50'
                    ELSE '+50' END AS age_group,
               p.category
        FROM pin_clean p JOIN user_clean u ON p.ind = u.ind
    ),
    counts AS (
        SELECT age_group, category,
               CAST(COUNT(category) AS BIGINT) AS category_count
        FROM bucketed GROUP BY 1, 2
    ),
    ranked AS (
        SELECT age_group, category, category_count,
               ROW_NUMBER() OVER (PARTITION BY age_group
                   ORDER BY category_count DESC, category ASC) AS rn
        FROM counts
    )
    SELECT age_group, category, category_count FROM ranked WHERE rn = 1
    """,
)
def pinterest_q4_top_category_per_age_group(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reference Q4 (README.md:546-574): most popular category per age
    group (native CASE age_range; the reference's UDF variant is
    bit-identical, functions/buckets)."""
    c = cleaned_fixture_tables(spark, sf_dir)
    return pq.q4_top_category_per_age_group(c["pin"], c["user"])


@register(
    "pinterest_q5_users_joined_per_year",
    oracle=f"""
    {_fixture_prefix()}
    SELECT CAST(year(date_joined) AS INTEGER) AS join_year,
           CAST(COUNT(user_name) AS BIGINT) AS number_users_joined
    FROM user_clean GROUP BY 1
    """,
)
def pinterest_q5_users_joined_per_year(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reference Q5 (README.md:583-592) with the no-dedup semantics
    preserved: df_user has one row per POSTING event (uid = ind % 512
    pool), so this counts posting-user records per join-year — the
    reference's bug #1, reproduced, with the documented distinct fix
    beside it in plans/pinterest_queries."""
    c = cleaned_fixture_tables(spark, sf_dir)
    return pq.q5_users_joined_per_year(c["user"])
