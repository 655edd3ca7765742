"""Gap-based sessionization of the events stream.

The classic batch sessionizer: within each user's timeline, a new
session starts wherever the gap since the previous event exceeds
``gap_seconds`` (default 30 minutes, the analytics convention).
The registered ``sessionize_events`` query reports per-USER session
counts inline; this module factors the same gap logic into a reusable
operator and adds the per-SESSION grain (start/end/count/value rows)
that downstream funnel/retention joins consume. The streaming twin of
this shape is Structured Streaming's session window; the batch form
here is what backfills and reprocessing run.

Engine-portability: gaps are compared in INTEGER MICROSECONDS
(``unix_micros`` / DuckDB ``epoch_us``) — no float timestamp math, no
timezone dependence — and the per-user ordering tiebreaks on the
event id, so session numbering is total and retry/engine-stable.

Scale shape: ONE shuffle on the user key; both windows (the lag and
the running session counter) and the final per-session aggregate ride
that same partitioning, so Spark plans a single Exchange followed by
sorts — no per-user skew beyond a user's own event count, and AQE's
skew handling applies to the exchange if one user dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Events plus a per-user ``session_id`` (1-based, in time order).

    A session starts at the user's first event and wherever
    ``ts - previous ts > gap_seconds`` (strict; an event exactly at
    the gap continues the session)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    us = F.unix_micros(F.col(ts_col))
    gap_us = F.lit(int(gap_seconds) * 1_000_000)
    new_session = F.when(
        F.lag(us).over(w).isNull() | (us - F.lag(us).over(w) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_id", F.sum(new_session).over(w).cast("int")
    )


def session_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """One row per session: (user, session_id, session_start,
    session_end, n_events, total_value). The value sum is rounded to
    6dp so cross-engine float-sum ordering noise sits below the
    comparison grain."""
    s = sessionize(events, gap_seconds, user_col, ts_col, tiebreak_col)
    return s.groupBy(user_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(value_col), 6).alias("total_value"),
    )
