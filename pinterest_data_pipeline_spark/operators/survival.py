"""Kaplan-Meier survival estimation over event logs — the
right-censoring-correct way to read "how long do users stay?" from a
log whose observation window is still open. A naive retention ratio
treats a user who joined yesterday as churned-after-one-day; KM keeps
them in the at-risk denominator exactly as long as they were actually
observable (Kaplan & Meier 1958).

Exactness: lifetimes, churn counts, and at-risk counts are integers
built from date arithmetic; the survival curve is exp(Σ ln(1 − dᵢ/nᵢ))
over an ordered window — the same ordered-ln-sum discipline as the
bigram LM scorer (operators/tfidf.py), replayed verbatim by DuckDB's
window sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    df: DataFrame,
    subject_col: str = "user_id",
    ts_col: str = "ts",
    censor_gap_days: int = 7,
    max_day: int = 30,
) -> DataFrame:
    """Kaplan-Meier retention curve: per subject, lifetime = days from
    first to last event; subjects whose last event falls within
    ``censor_gap_days`` of the log's end are CENSORED (they may still
    be active — their lifetime is a lower bound, so they exit the risk
    set at that point without counting as churn). Returns one row per
    observed churn day ≤ ``max_day``:

        (day, n_risk, n_churn, n_censored, survival_r6)

    where n_risk counts subjects with lifetime ≥ day, n_churn the
    uncensored subjects churning exactly at day, and survival the KM
    product estimate Π_{i ≤ day} (1 − churnᵢ/riskᵢ).

    Scale: one corpus aggregate (per-subject first/last — map-side
    combine), then every relation is |distinct lifetimes| rows; the
    cumulative product is a window over that tiny ordered relation.
    The log-end timestamp is a 1-row broadcast, never a collect."""
    per_subject = df.groupBy(F.col(subject_col).alias("__s")).agg(
        F.date_trunc("day", F.min(ts_col)).alias("__first"),
        F.date_trunc("day", F.max(ts_col)).alias("__last"),
    )
    log_end = df.agg(
        F.date_trunc("day", F.max(ts_col)).alias("__end")
    )
    subjects = per_subject.crossJoin(F.broadcast(log_end)).select(
        F.datediff(F.col("__last"), F.col("__first"))
        .cast("bigint")
        .alias("__life"),
        (
            F.datediff(F.col("__end"), F.col("__last"))
            < F.lit(censor_gap_days)
        ).alias("__censored"),
    )
    per_day = subjects.groupBy(F.col("__life").alias("day")).agg(
        F.sum(F.when(~F.col("__censored"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_churn"),
        F.sum(F.when(F.col("__censored"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_censored"),
        F.count(F.lit(1)).cast("bigint").alias("__exits"),
    )
    # at-risk at day d = everyone exiting (churn or censor) at day ≥ d:
    # reverse cumulative sum over the ordered day relation
    w_risk = Window.orderBy(F.col("day").asc()).rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    w_surv = Window.orderBy(F.col("day").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # ln(1 − d/n) is −inf exactly when the whole remaining risk set
    # churns — which can only be the LAST row (nobody has a longer
    # lifetime), so an explicit 0.0 there keeps ln out of the domain
    # edge and identical on both engines (Spark ln(0) → NULL, DuckDB
    # → −inf: unguarded they would diverge).
    ratio = F.col("n_churn").cast("double") / F.col("n_risk").cast("double")
    term = F.when(
        F.col("n_churn") < F.col("n_risk"), F.log(F.lit(1.0) - ratio)
    )
    curve = per_day.withColumn(
        "n_risk", F.sum("__exits").over(w_risk).cast("bigint")
    ).withColumn(
        "survival_r6",
        F.when(F.col("n_churn") == F.col("n_risk"), F.lit(0.0)).otherwise(
            F.round(F.exp(F.sum(term).over(w_surv)), 6)
        ),
    )
    return curve.select(
        "day", "n_risk", "n_churn", "n_censored", "survival_r6"
    ).filter(F.col("day") <= max_day).orderBy("day")
