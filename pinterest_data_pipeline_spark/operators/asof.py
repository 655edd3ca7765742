"""As-of (most-recent-prior) join — an operator Spark lacks natively.

Implemented as the union + ordered-window ``last_value(ignorenulls)``
pattern (a standard composition of existing DataFrame ops, per the
engine's custom-operator policy):

1. Tag right rows, union them with left rows on a common (key, ts) spine.
2. Sort within each key by (ts, tag) — right rows sort BEFORE left rows
   at equal timestamps, so an exactly-simultaneous right row is visible
   to the left row (inclusive as-of, DuckDB-compatible).
3. ``last(right_payload, ignorenulls=True)`` over rows-unbounded-preceding
   carries the most recent right value forward onto each left row.

Scale: one hash shuffle on the key + an in-partition sort — identical
cost to a groupBy over the same key, no broadcast or range replication.
Skewed keys fall under AQE skew handling like any other shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` on the same key (inclusive). Left rows with no
    prior right row keep NULLs. Output: all left columns +
    ``<value_col><suffix>`` columns.

    ``direction='forward'`` flips the scan: attach the EARLIEST right
    row with ``right.ts >= left.ts`` (the "next reading" join — same
    union-spine window with the order reversed, so cost is identical).
    For the closest row in either direction use
    :func:`asof_join_nearest`.

    NULL keys follow JOIN semantics, not window semantics: a NULL-key
    right row matches nothing (filtered off the spine — the window's
    partitionBy would otherwise group all NULL keys together and
    attach them to NULL-key left rows, which no equality-based as-of
    join, DuckDB's included, would do), and NULL-key left rows pass
    through with NULL value columns.

    NULL timestamps get the same JOIN-not-window treatment: the as-of
    predicate ``right.ts <= left.ts`` is NULL when either side is
    NULL, so a NULL-ts right row matches nothing (filtered off the
    spine) and a NULL-ts left row passes through with NULL value
    columns (ordered NULLS FIRST in BOTH directions, it precedes
    every right row in the window, so nothing is carried onto it —
    Spark's desc default of NULLS LAST would otherwise hand it the
    final carried value in the forward scan)."""
    right = right.filter(
        F.col(key).isNotNull() & F.col(right_ts).isNotNull()
    )
    left_cols = left.columns
    # All value columns ride in ONE struct, carried atomically: the struct is
    # non-NULL exactly when the row is a right row, so last(ignorenulls) always
    # attaches every value column from the SAME right row (per-column carries
    # could mix rows when a right row holds NULL in one value column and a
    # value in another).
    spine_left = left.select(
        F.col(key).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*left_cols).alias("__left"),
        F.lit(None)
        .cast(right.select(*[F.col(c) for c in value_cols]).schema)
        .alias("__r"),
    )
    spine_right = right.select(
        F.col(key).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            spine_left.schema["__left"].dataType
        ).alias("__left"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__r"),
    )
    spine = spine_left.unionByName(spine_right)
    # Tie order: right rows before left at equal ts (inclusive as-of);
    # multiple right rows at identical (key, ts) are ordered by their value
    # struct (lexicographic by field), so the carried row is deterministic
    # (the max tuple). Callers wanting different tie semantics should
    # pre-aggregate the right side to one row per (key, ts).
    # Forward direction reverses only the timestamp order: the window
    # then walks future-first, so last(ignorenulls) carries the nearest
    # FUTURE right row; the equal-ts inclusive rule is unchanged.
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    ts_order = (
        F.col("__ts").asc_nulls_first()
        if direction == "backward"
        else F.col("__ts").desc_nulls_first()
    )
    w = (
        Window.partitionBy("__key")
        .orderBy(
            ts_order,
            F.col("__is_left").asc(),
            F.col("__r").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = spine.select(
        "__is_left",
        "__left",
        F.last("__r", ignorenulls=True).over(w).alias("__carried"),
    ).filter(F.col("__is_left") == 1)
    return carried.select(
        *[F.col(f"__left.{c}").alias(c) for c in left_cols],
        *[F.col(f"__carried.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_seconds: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Nearest-direction as-of join (pandas ``merge_asof
    direction='nearest'``): for each left row, attach the right row with
    the minimum ``|right.ts - left.ts|`` on the same key, optionally
    bounded by ``tolerance_seconds`` (beyond it the columns stay NULL).
    Delta ties prefer the BACKWARD (earlier) row — deterministic, and
    what "state as of this moment, else the next known state" means.

    Composition: one backward and one forward pass (each a single
    key-shuffle + in-partition sort — the nearest candidate is always
    either the latest prior or earliest future row), then a row-level
    chooser. Deltas compare as exact epoch doubles (timestamp → double
    keeps microseconds; both engines compute the identical subtraction,
    so the choice is engine-portable). Cost: TWO sequential key
    shuffles, not one — each pass builds its own union spine (the
    forward pass unions the backward pass's output with ``right``
    again), so the second window cannot reuse the first exchange.
    Still linear in rows with no range replication; a shared-spine
    single-shuffle variant would save one exchange at the price of a
    much hairier carry-column layout."""
    carry = [right_ts] + [c for c in value_cols if c != right_ts]
    b = asof_join(
        left, right, key, left_ts, right_ts, carry,
        suffix="__b", direction="backward",
    )
    bf = asof_join(
        b, right, key, left_ts, right_ts, carry,
        suffix="__f", direction="forward",
    )
    lts = F.col(left_ts).cast("double")
    d_b = lts - F.col(f"{right_ts}__b").cast("double")
    d_f = F.col(f"{right_ts}__f").cast("double") - lts
    if tolerance_seconds is not None:
        b_ok = F.col(f"{right_ts}__b").isNotNull() & (
            d_b <= F.lit(float(tolerance_seconds))
        )
        f_ok = F.col(f"{right_ts}__f").isNotNull() & (
            d_f <= F.lit(float(tolerance_seconds))
        )
    else:
        b_ok = F.col(f"{right_ts}__b").isNotNull()
        f_ok = F.col(f"{right_ts}__f").isNotNull()
    # row-level side choice (all carried columns come from the SAME row):
    # backward wins when in-tolerance and (forward missing or d_b <= d_f)
    choose_b = b_ok & (~f_ok | (d_b <= d_f))
    out_cols = [F.col(c) for c in left.columns]
    for c in value_cols:
        out_cols.append(
            F.when(choose_b, F.col(f"{c}__b"))
            .when(f_ok, F.col(f"{c}__f"))
            .alias(f"{c}{suffix}")
        )
    return bf.select(*out_cols)
