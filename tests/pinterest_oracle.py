"""DuckDB oracle SQL for the Pinterest-shaped cleaning + canonical queries.

Expresses the reference's cleaning contract (reference README.md:371-440)
and Q1-Q5 (README.md:449-592, deterministic window form) in ANSI SQL so
the Spark implementations can be cross-checked on the generated fixtures.
"""

SENTINEL_LIST = """(
    'No description available Story format',
    'User Info Error',
    'Image src error.',
    'N,o, ,T,a,g,s, ,A,v,a,i,l,a,b,l,e',
    'No Title Data Available'
)"""


def _null_out(col: str) -> str:
    return f"CASE WHEN {col} IN {SENTINEL_LIST} THEN NULL ELSE {col} END"


# The follower_count cast in CLEAN_CTES is regex-guarded rather than a bare
# TRY_CAST because DuckDB TRY_CAST('1.5000000' AS INTEGER) ROUNDS to 2
# while Spark ANSI try_cast yields NULL — a bare TRY_CAST diverges on
# exactly the "1.5M" rows the reference's preserved cleaning bug
# produces (it previously passed only because no fixture user had ALL
# pins dirty; see plans/pinterest_driver.py for the driver-side twin).


CLEAN_CTES = f"""
pin_clean AS (
    SELECT
        CAST("index" AS INTEGER) AS ind,
        {_null_out('unique_id')} AS unique_id,
        {_null_out('title')} AS title,
        {_null_out('description')} AS description,
        {_null_out('poster_name')} AS poster_name,
        CASE WHEN regexp_matches(
                 replace(replace({_null_out('follower_count')}, 'k', '000'),
                         'M', '000000'), '^[0-9]+$')
             THEN CAST(
                 replace(replace({_null_out('follower_count')}, 'k', '000'),
                         'M', '000000') AS INTEGER)
             ELSE NULL END AS follower_count,
        {_null_out('tag_list')} AS tag_list,
        {_null_out('is_image_or_video')} AS is_image_or_video,
        {_null_out('image_src')} AS image_src,
        CAST(downloaded AS INTEGER) AS downloaded,
        split_part({_null_out('save_location')}, ' ', 4) AS save_location,
        {_null_out('category')} AS category
    FROM pin
),
geo_clean AS (
    SELECT CAST(ind AS INTEGER) AS ind,
           {_null_out('country')} AS country,
           [latitude, longitude] AS coordinates,
           CAST("timestamp" AS TIMESTAMP) AS "timestamp"
    FROM geo
),
user_clean AS (
    SELECT CAST(ind AS INTEGER) AS ind,
           first_name || last_name AS user_name,
           CAST(age AS INTEGER) AS age,
           CAST(date_joined AS TIMESTAMP) AS date_joined
    FROM "user"
)
"""

AGE_RANGE_SQL = """
    CASE WHEN age IS NULL THEN NULL
         WHEN age < 25 THEN '18-24'
         WHEN age BETWEEN 25 AND 35 THEN '25-35'
         WHEN age BETWEEN 36 AND 50 THEN '36-50'
         ELSE '+50' END
"""

Q1_SQL = f"""
WITH {CLEAN_CTES},
counts AS (
    SELECT g.country, p.category, COUNT(p.category) AS category_count
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
"""

Q2_SQL = f"""
WITH {CLEAN_CTES},
counts AS (
    SELECT CAST(year(g."timestamp") AS INTEGER) AS post_year, p.category,
           COUNT(p.category) AS category_count
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
"""

Q3A_SQL = f"""
WITH {CLEAN_CTES},
per_user AS (
    SELECT g.country, u.user_name, MAX(p.follower_count) AS follower_count
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
"""

Q3B_SQL = f"""
WITH base AS ({Q3A_SQL})
SELECT country, follower_count FROM base
ORDER BY follower_count DESC, country ASC LIMIT 1
"""

Q4_SQL = f"""
WITH {CLEAN_CTES},
bucketed AS (
    SELECT {AGE_RANGE_SQL} AS age_group, p.category
    FROM pin_clean p JOIN user_clean u ON p.ind = u.ind
),
counts AS (
    SELECT age_group, category, COUNT(category) AS category_count
    FROM bucketed GROUP BY 1, 2
),
ranked AS (
    SELECT age_group, category, category_count,
           ROW_NUMBER() OVER (PARTITION BY age_group
               ORDER BY category_count DESC, category ASC) AS rn
    FROM counts
)
SELECT age_group, category, category_count FROM ranked WHERE rn = 1
"""

Q5_SQL = f"""
WITH {CLEAN_CTES}
SELECT CAST(year(date_joined) AS INTEGER) AS join_year,
       COUNT(user_name) AS number_users_joined
FROM user_clean GROUP BY 1
"""

Q5_DISTINCT_SQL = f"""
WITH {CLEAN_CTES}
SELECT CAST(year(date_joined) AS INTEGER) AS join_year,
       COUNT(DISTINCT user_name) AS number_users_joined
FROM user_clean GROUP BY 1
"""
