"""Calendar proration: recognize an interval-scoped amount across the
calendar months it overlaps — the revenue-recognition / subscription
accounting primitive (ASC 606's time-based allocation in its integer
form): a 90-day service sold on day d earns cents · overlap_days / 90
in each month the service window touches.

Engine discipline (the house integer-exactness rules):

- overlap days are exact integer date arithmetic
  (min(month_end, end) − max(month_start, start), both exclusive-end);
- each month's share is floor(cents · days / term_days) — an exact
  bigint — and the rounding remainder goes to the FIRST overlapped
  month (the industry "recognize the odd cents up front" convention),
  so Σ shares ≡ cents per row, conservation by construction, never a
  float;
- the month spine is generated from the data's own [min, max+term)
  date span — no calendar table dependency.

Scale: the spine join is a band join of rows × overlapping-months
(≤ ⌈term/28⌉ + 1 per row — a small constant fan-out, not a cross
join); the remainder correction is one window over that row's own
months (per-row partitions). One shuffle on the row id, one on month.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prorate_interval_cents(
    df: DataFrame,
    id_col: str,
    start_col: str,
    cents_col: str,
    term_days: int,
) -> DataFrame:
    """Explode each (id, start_date, cents) row into its per-month
    recognized shares over [start, start + term_days). Returns
    (id, month_start DATE, days bigint, recognized_cents bigint) with
    Σ recognized_cents = cents exactly per id."""
    rows = df.select(
        F.col(id_col).alias("__id"),
        F.col(start_col).cast("date").alias("__d0"),
        F.col(cents_col).cast("long").alias("__cents"),
    ).withColumn("__d1", F.date_add(F.col("__d0"), term_days))
    months = rows.select(
        F.explode(
            F.sequence(
                F.trunc(F.col("__d0"), "month"),
                F.trunc(F.date_sub(F.col("__d1"), 1), "month"),
                F.expr("interval 1 month"),
            )
        ).alias("month_start"),
        "__id",
        "__d0",
        "__d1",
        "__cents",
    ).withColumn("__m1", F.add_months(F.col("month_start"), 1))
    days = F.datediff(
        F.least(F.col("__m1"), F.col("__d1")),
        F.greatest(F.col("month_start"), F.col("__d0")),
    ).cast("long")
    shared = months.select(
        "__id",
        "month_start",
        "__cents",
        days.alias("days"),
        (F.col("__cents") * days - (F.col("__cents") * days) % term_days)
        .cast("long")
        .alias("__scaled"),
    ).withColumn(
        "__share", (F.col("__scaled") / term_days).cast("long")
    )
    w = Window.partitionBy("__id")
    first = Window.partitionBy("__id").orderBy("month_start")
    return (
        shared.withColumn("__total_floor", F.sum("__share").over(w))
        .withColumn("__rn", F.row_number().over(first))
        .select(
            F.col("__id").alias(id_col),
            "month_start",
            F.col("days").cast("bigint").alias("days"),
            (
                F.col("__share")
                + F.when(
                    F.col("__rn") == 1,
                    F.col("__cents") - F.col("__total_floor"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("recognized_cents"),
        )
    )
