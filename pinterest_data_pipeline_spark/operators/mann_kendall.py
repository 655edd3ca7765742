"""Mann-Kendall trend test — the nonparametric "is this KPI actually
trending" gate (Mann 1945, Kendall 1975; the monitoring standard
because it needs no distributional assumption and is immune to the
outliers that wreck an OLS slope, cf. ols_price_vs_quantity).

The statistic is PURE INTEGER arithmetic over exact values:

    S       = Σ_{i<j} sign(x_j − x_i)                    (bigint)
    var_num = n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5)         (bigint)
    Var(S)  = var_num / 18
    z       = (S − sign(S)) / sqrt(Var(S))               (one double op)

so cross-engine comparison is exact up to the single final
division/sqrt, computed by both engines from identical integers (the
unordered-double-sum hazard robust_stats documents is avoided by
construction). Callers feed integer values — cents, counts — never raw
doubles.

Scale: the caller pre-aggregates to one row per (group, period) — a
PERIODS-sized relation (days/weeks), not a data-sized one — so the
pairwise self-join is |periods|² per group over a broadcast aggregate:
constant work regardless of fact-table size. The input aggregate
itself is one map-side-combinable shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mann_kendall(
    series: DataFrame,
    group_cols: list[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Mann-Kendall S, tie-corrected variance numerator, and the
    continuity-corrected z per group.

    ``series`` must hold ONE row per (group, order) — the per-period
    aggregate — with ``value_col`` an exact integer. Output per group:
    ``n_periods``, ``s_stat``, ``var_num`` (both bigint, hash-exact),
    ``z_r6`` (the one rounded double; NULL when ``var_num`` ≤ 0, i.e.
    fewer than 2 periods or all values tied)."""
    a = series.select(
        *group_cols,
        F.col(order_col).alias("__o"),
        F.col(value_col).cast("long").alias("__v"),
    )
    b = a.select(
        *group_cols,
        F.col("__o").alias("__o2"),
        F.col("__v").alias("__v2"),
    )
    pairs = a.join(F.broadcast(b), group_cols).where(
        F.col("__o") < F.col("__o2")
    )
    s = pairs.groupBy(*group_cols).agg(
        F.sum(F.signum(F.col("__v2") - F.col("__v")).cast("long")).alias(
            "s_stat"
        )
    )

    ties = a.groupBy(*group_cols, "__v").agg(F.count(F.lit(1)).alias("__t"))
    tie_term = ties.groupBy(*group_cols).agg(
        F.sum(
            F.col("__t") * (F.col("__t") - 1) * (2 * F.col("__t") + 5)
        ).alias("__tie_sum"),
        F.sum("__t").alias("n_periods"),
    )

    n = F.col("n_periods")
    # LEFT join: a single-period group has no pairs (S = 0 by
    # convention), and must surface with var_num = 0 / z NULL rather
    # than silently vanish from the report.
    joined = tie_term.join(s, group_cols, "left").select(
        *group_cols,
        "n_periods",
        F.coalesce(F.col("s_stat"), F.lit(0)).alias("s_stat"),
        (n * (n - 1) * (2 * n + 5) - F.col("__tie_sum")).alias("var_num"),
    )
    ss = F.col("s_stat")
    z = F.when(
        F.col("var_num") <= 0, F.lit(None).cast("double")
    ).otherwise(
        (ss - F.signum(ss))
        / F.sqrt(F.col("var_num").cast("double") / F.lit(18.0))
    )
    return joined.withColumn("z_r6", F.round(z, 6))
