"""Time-series queries over the events table: time-RANGE window frames and
sequential (lag-based) transition statistics.

Complements the existing window coverage (`relational_ops`): those pin
ROWS-frame running totals and rank/distribution functions; these pin the
time-anchored RANGE frame ("everything in the trailing hour", independent
of row count) and ordered-sequence transitions — the shapes behind rate
limiting, rolling engagement, and next-action modeling.

Determinism contract (driver value-hashes): money flows as integer cents,
probabilities as integer parts-per-million via floor division — no double
accumulation anywhere, so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.plans.registry import register
from pinterest_data_pipeline_spark.sources.parquet import load_table


@register(
    "rolling_1h_user_value",
    oracle="""
    WITH t AS (
        SELECT event_id, user_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS sec,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    )
    SELECT event_id, user_id,
           CAST(SUM(cents) OVER w AS BIGINT) AS cents_1h,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_1h
    FROM t
    WINDOW w AS (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def rolling_1h_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1-hour per-user activity: for every event, the sum of
    event value (cents) and event count within [ts - 1h, ts] for the same
    user — a time-RANGE frame, not a ROWS frame, so sparse and bursty
    users are both windowed by wall-clock.

    Both engines order by floor-epoch-seconds (Spark ``unix_timestamp``
    floors; DuckDB ``floor(epoch(..))`` matches), so the frame boundary is
    the identical integer comparison. Events sharing a second are RANGE
    peers — included together by definition on both sides, which keeps the
    result well-defined under timestamp ties.

    Scale: one shuffle on ``user_id``, then a per-partition sort —
    identical cost profile to any per-user window. No joins, no
    self-cartesian "events within an hour" expansion; the running frame is
    computed by the window operator's sliding aggregate state.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("sec"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return base.select(
        "event_id",
        "user_id",
        F.sum("cents").over(w).alias("cents_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events WHERE ts IS NOT NULL
    ), counts AS (
        SELECT prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS n_trans
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, n_trans,
           CAST((n_trans * 1000000) //
                SUM(n_trans) OVER (PARTITION BY prev_type) AS BIGINT)
               AS p_ppm
    FROM counts
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix over per-user event sequences:
    P(next_type | prev_type) as integer parts-per-million. The sequence
    order is (ts, event_id) — event_id breaks timestamp ties so ``lag``
    is deterministic under concurrent events. NULL-ts events are
    dropped before the lag: they have no sequence position, and Spark
    (NULLS FIRST) vs ANSI engines (commonly LAST) would otherwise
    splice them into different transitions.

    Probability is ``(n * 1_000_000) div total`` — floor division of
    exact counts, bit-identical across engines (a rounded double ratio
    could flip its last digit on ties).

    Scale: one shuffle on ``user_id`` for the lag, one metadata-sized
    aggregation on (prev, next) — the matrix is |event_types|² rows no
    matter how large the input. The per-prev_type normalizing window runs
    on that tiny aggregate, not on the events table.
    """
    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
    )
    seq_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(seq_w).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    counts = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n_trans"))
    return counts.select(
        "prev_type",
        "next_type",
        "n_trans",
        F.expr("(n_trans * 1000000) div sum(n_trans) over (partition by prev_type)").alias(
            "p_ppm"
        ),
    )


@register(
    "gap_fill_hourly_user_value",
    oracle="""
    WITH sampled AS (
        SELECT * FROM events WHERE user_id % 10 = 0
    ), hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS hour,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM sampled GROUP BY 1, 2
    ), bounds AS (
        SELECT user_id, min(hour) AS h_lo, max(hour) AS h_hi FROM hourly
        GROUP BY 1
    ), spine AS (
        SELECT user_id,
               unnest(generate_series(h_lo, h_hi, INTERVAL 1 HOUR)) AS hour
        FROM bounds
    )
    SELECT s.user_id,
           strftime(s.hour, '%Y-%m-%d %H:%M:%S') AS hour,
           h.cents AS cents,
           COALESCE(h.n_events, 0) AS n_events,
           last_value(h.cents IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cents_filled
    FROM spine s LEFT JOIN hourly h
      ON s.user_id = h.user_id AND s.hour = h.hour
    """,
)
def gap_fill_hourly_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling + forward fill: densify each (sampled) user's activity
    to a complete hourly spine between their first and last active hour,
    then carry the last observed hourly total across silent hours — the
    resample/ffill shape every downstream timeseries model expects.

    The spine is generated with ``sequence`` + ``explode`` per user (span
    is data-bounded, no cross join against a global calendar), the
    observed hours left-join onto it, and the fill is
    ``last(ignorenulls)`` over the hour order.

    Scale: everything is keyed by ``user_id`` — the hourly pre-aggregate,
    the spine generation, the join, and the fill window reuse one
    partitioning; spine size is Σ per-user spans, never |users|×|global
    hours|. The ``% 10`` sample bounds this demo query's output; the
    operator shape is sample-independent.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") % 10 == 0)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
        F.count(F.lit(1)).alias("n_events"),
    )
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("hour").alias("h_lo"), F.max("hour").alias("h_hi"))
        .select(
            "user_id",
            F.explode(
                F.sequence("h_lo", "h_hi", F.expr("interval 1 hour"))
            ).alias("hour"),
        )
    )
    joined = spine.join(hourly, ["user_id", "hour"], "left")
    fill_w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        # hour emitted as a formatted string: pandas renders Spark
        # timestamps as datetime64[ns] but DuckDB's as datetime64[us],
        # and the driver's value hash is dtype-sensitive (same trap
        # class as HUGEINT→float64); arithmetic upstream stays TIMESTAMP
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.col("cents").alias("cents"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("cents", ignorenulls=True).over(fill_w).alias("cents_filled"),
    )


@register(
    "cumulative_unique_users",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, CAST(min(ts) AS DATE) AS d FROM events GROUP BY 1
    ), daily AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS n_new FROM first_seen GROUP BY 1
    )
    SELECT strftime(d, '%Y-%m-%d') AS d, n_new,
           CAST(SUM(n_new) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_users
    FROM daily
    """,
)
def cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-growth curve: cumulative distinct users by day. A naive
    count-distinct-over-expanding-window rescans history per day; the
    scalable identity is first-seen date per user → per-day new-user
    counts → running sum, which is two keyed aggregations plus a window
    over |days| rows.

    Scale: the only data-sized shuffle is the per-user min; the running
    sum runs over the calendar-sized aggregate. The single-partition
    global window is safe BECAUSE its input is |days| rows (for an
    unbounded key space, partition the window by month and prefix-sum the
    month totals driver-side).
    """
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("d")
    )
    daily = first_seen.groupBy("d").agg(F.count(F.lit(1)).alias("n_new"))
    run_w = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        # date emitted as yyyy-MM-dd string: engines disagree on DATE
        # canonicalization at the comparison boundary (datetime.date vs
        # datetime64); arithmetic upstream stays on DATE
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        "n_new",
        F.sum("n_new").over(run_w).alias("cum_users"),
    )
