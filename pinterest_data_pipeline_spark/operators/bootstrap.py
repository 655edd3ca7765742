"""Poisson bootstrap confidence intervals — the resampling scheme that
actually works on a cluster (Chamandy et al., Google 2012; Kleiner's
BLB is its heavyweight cousin): classic bootstrap needs a multinomial
draw over ALL n rows per resample (a global coordination step), while
the Poisson bootstrap gives every (row, resample) an INDEPENDENT
Poisson(1) weight — one scan computes every resample at once, embarrassingly
parallel, exact at n→∞ and indistinguishable in practice past a few
thousand rows.

Determinism/portability: the weight is a pure function of
(salt, row id, resample index): resample b reads the (b mod 4)-th
32-bit window of md5(salt:id:b div 4) — u uniform on [0, 2^32)
compared against FLOOR(CDF_Poisson(1) · 2^32) literals both engines
share (the baked-constant discipline of
_MH_PARAMS_SQL / _PLANES_SQL). Resample sums are Σ w·cents — exact
bigints — so the only doubles are the final per-resample mean
divisions and the CI order statistics over them, identical IEEE ops
from identical integers in any engine.

Scale: ONE scan fans each row out B times (B ≈ 64 — a constant, not a
data multiple), one map-side-combinable aggregate to (group, b), and
the order-statistic window runs on |groups|·B rows — metadata-sized.
No collect, no global sort, no per-row Python.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: FLOOR(P[Poisson(1) ≤ k] · 2^32) for k = 0..8; weights cap at 9
#: (P[X > 8] ≈ 1.1e-7 — one phantom row per ~9M fan-outs at most).
POISSON_CDF_U32: list[int] = []
_cum = 0.0
for _k in range(9):
    _cum += math.exp(-1) / math.factorial(_k)
    POISSON_CDF_U32.append(int(_cum * 2**32))

def poisson_weight(u: Column) -> Column:
    """Inverse-CDF Poisson(1) weight from a uniform u ∈ [0, 2^32)."""
    w: Column = F.lit(len(POISSON_CDF_U32))
    for k in range(len(POISSON_CDF_U32) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON_CDF_U32[k]), F.lit(k)).otherwise(w)
    return w


def poisson_bootstrap_mean_ci(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    cents_col: str,
    n_resamples: int = 64,
    salt: str = "boot",
) -> DataFrame:
    """95% bootstrap CI for the per-group mean of an integer-cents
    column. Output per group: ``n_rows``, ``mean_r6`` (full-sample),
    ``ci_lo_r6`` / ``ci_hi_r6`` (type-1 order statistics — the
    ⌈B·0.025⌉-th and ⌈B·0.975⌉-th smallest resample means, tie-broken
    by resample index), ``n_resamples`` (must be a multiple of 4)."""
    if n_resamples % 4 != 0:
        raise ValueError(
            f"n_resamples must be a multiple of 4 (got {n_resamples}): "
            "each md5 digest supplies four 32-bit uniforms"
        )
    cents = F.col(cents_col).cast("long")
    from pinterest_data_pipeline_spark.operators.parallel import fan_out

    # ONE md5 per (row, digest-index), FOUR independent 32-bit windows
    # per digest (a 128-bit md5 is four u32s) — 4× less hashing than a
    # digest per (row, resample), measured 9.5 s → ~2.5 s at sf0.1 for
    # B = 64 over 2M rows. Resample b reads window (b mod 4) of digest
    # (b div 4); windows of one digest are as independent as separate
    # digests. fan_out first: the explode × md5 and the resample
    # partial aggregation otherwise run inside a single-split scan task
    # (operators/parallel); resample sums are exact integers, so the
    # partitioning change cannot move a bit.
    digests = fan_out(df).select(
        *group_cols,
        F.col(id_col).alias("__id"),
        cents.alias("__c"),
        F.explode(
            F.sequence(F.lit(0), F.lit(int(n_resamples) // 4 - 1))
        ).alias("__j"),
    ).withColumn(
        "__hx",
        F.md5(
            F.concat_ws(
                ":",
                F.lit(salt),
                F.col("__id").cast("string"),
                F.col("__j").cast("string"),
            )
        ),
    )
    exploded = digests.select(
        *group_cols,
        "__c",
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("__j") * 4 + w).alias("__b"),
                        F.conv(
                            F.substring(F.col("__hx"), w * 8 + 1, 8), 16, 10
                        )
                        .cast("long")
                        .alias("__u"),
                    )
                    for w in range(4)
                ]
            )
        ).alias("__bu"),
    ).select(
        *group_cols,
        "__c",
        F.col("__bu.__b").alias("__b"),
        F.col("__bu.__u").alias("__u"),
    ).withColumn("__w", poisson_weight(F.col("__u")))
    means = (
        exploded.groupBy(*group_cols, "__b")
        .agg(
            F.sum(F.col("__w") * F.col("__c")).alias("__s"),
            F.sum("__w").alias("__n"),
        )
        .where(F.col("__n") > 0)
        .withColumn("__m", F.col("__s") / F.col("__n"))
    )
    g = Window.partitionBy(*group_cols)
    ranked = means.select(
        *group_cols,
        "__m",
        F.row_number().over(g.orderBy("__m", "__b")).alias("__r"),
        F.count(F.lit(1)).over(g).alias("__nb"),
    )
    lo_rank = (F.col("__nb") * 25 + 999) / 1000
    hi_rank = (F.col("__nb") * 975 + 999) / 1000
    ci = ranked.groupBy(*group_cols).agg(
        F.round(
            F.min(
                F.when(
                    F.col("__r") == lo_rank.cast("long"), F.col("__m")
                )
            ),
            6,
        ).alias("ci_lo_r6"),
        F.round(
            F.min(
                F.when(
                    F.col("__r") == hi_rank.cast("long"), F.col("__m")
                )
            ),
            6,
        ).alias("ci_hi_r6"),
        F.max("__nb").alias("n_resamples"),
    )
    full = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(cents) / F.count(F.lit(1)), 6).alias("mean_r6"),
    )
    return full.join(ci, group_cols).select(
        *group_cols,
        "n_rows",
        "mean_r6",
        "ci_lo_r6",
        "ci_hi_r6",
        "n_resamples",
    )
