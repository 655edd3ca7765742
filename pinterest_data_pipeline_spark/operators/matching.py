"""Caliper nearest-neighbor matching — the observational-causal layer
of the experimentation plane: when assignment was NOT randomized (or a
randomized readout needs a covariate-balanced subset), each treatment
unit is paired with its nearest control on a covariate, within a
caliper, and the estimate runs on the matched set. The quality readout
is covariate BALANCE: the standardized mean difference (SMD) before vs
after matching — matching succeeded when |SMD| collapses toward 0
(|SMD| < 0.1 is the conventional "balanced" bar).

Matching rule (deterministic, with replacement): control c matches
treatment t when |x_t − x_c| ≤ caliper, minimizing (|x_t − x_c|, c_id)
— the id tiebreak makes the argmin total, so every engine and the SQL
oracle reproduce the identical matched set. With-replacement matching
keeps the operator one join + one argmin (greedy without-replacement
matching is inherently sequential — a driver-side loop at any scale —
and is out of scope by design).

Candidate generation is BUCKETED, never n²: with bucket = floor(x /
caliper), any control within the caliper of t lives in t's bucket ± 1,
so treatments probe exactly 3 buckets. Candidate volume is (local
control density) × 3 per treatment — linear in units for any
non-degenerate covariate. A pathological spike (many controls in one
bucket) degrades that bucket only; the LSH bucket-cap pattern applies
if a production covariate is that degenerate.

Exactness: the covariate enters in INTEGER units (cents); |dx| and the
argmin are integer comparisons; means/variances derive from bigint
sums cast to double only for the final scalar arithmetic (identical
expressions both engines), rounded to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def caliper_match_balance(
    units: DataFrame,
    id_col: str,
    arm_col: str,
    x_col: str,
    caliper: int,
) -> DataFrame:
    """ONE-row matching + balance report over a unit relation with a
    two-valued ``arm_col`` ('treatment'/'control') and an integer
    covariate ``x_col``:

        (n_treatment, n_control, n_matched, match_rate_r6,
         mean_abs_dx_r6, smd_before_r6, smd_after_r6)

    ``smd_before_r6`` is the classic pooled-SD standardized mean
    difference over ALL units; ``smd_after_r6`` re-reads it over the
    matched pairs (treatment x vs matched-control x), against the SAME
    pre-matching pooled SD so the two numbers share a scale (Stuart
    2010's convention). Degenerate inputs yield NULL, never a throw
    (ANSI-safe): SMDs need ≥ 2 units per arm, the after-matching stats
    need ≥ 1 match. ``mean_abs_dx_r6`` is the average matched
    distance in covariate units.

    Scale: one grouped moment aggregate per arm (map-side combine, ONE
    row each), one bucketed equi-join (treatments explode to 3 probe
    buckets), one per-treatment integer argmin via min(struct), then a
    single-row aggregate. No window over the full relation, no n²."""
    if caliper < 1:
        raise ValueError(f"caliper must be >= 1, got {caliper}")
    base = units.select(
        F.col(id_col).alias("__id"),
        F.col(arm_col).alias("__arm"),
        F.col(x_col).cast("bigint").alias("__x"),
    ).filter(F.col("__x").isNotNull())
    # NULL covariates are excluded up front: a NULL x can neither be
    # matched nor contribute to moments, and keeping such rows in the
    # arm counts would silently skew means (sums skip NULLs, counts
    # would not).
    # floor(x / caliper) in EXACT integer arithmetic: subtract the
    # non-negative remainder ((x % c) + c) % c so the numerator is an
    # exact multiple of c, where `div` truncation equals floor — also
    # for negative balances. (A double round-trip loses integer
    # precision for |x| >= 2^53, silently shifting boundary buckets;
    # this formulation is exact over the full bigint range.)
    c = int(caliper)
    bucket = F.expr(f"(__x - ((__x % {c}) + {c}) % {c}) div {c}")
    treat = base.filter(F.col("__arm") == "treatment").select(
        F.col("__id").alias("__tid"),
        F.col("__x").alias("__tx"),
        F.explode(
            F.array(bucket - 1, bucket, bucket + 1)
        ).alias("__b"),
    )
    ctrl = base.filter(F.col("__arm") == "control").select(
        F.col("__id").alias("__cid"),
        F.col("__x").alias("__cx"),
        bucket.alias("__b"),
    )
    cand = (
        treat.join(ctrl, "__b")
        .withColumn("__adx", F.abs(F.col("__tx") - F.col("__cx")))
        .filter(F.col("__adx") <= caliper)
    )
    matched = cand.groupBy("__tid", "__tx").agg(
        F.min(F.struct("__adx", "__cid", "__cx")).alias("__best")
    )
    pair_stats = matched.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matched"),
        F.sum("__best.__adx").cast("bigint").alias("__sum_adx"),
        F.sum("__tx").cast("bigint").alias("__sum_mt"),
        F.sum("__best.__cx").cast("bigint").alias("__sum_mc"),
    )
    arm_is_t = F.when(F.col("__arm") == "treatment", 1).otherwise(0)
    moments = base.agg(
        F.sum(arm_is_t).cast("bigint").alias("n_treatment"),
        F.sum(1 - arm_is_t).cast("bigint").alias("n_control"),
        F.sum(arm_is_t * F.col("__x")).cast("bigint").alias("__sx_t"),
        F.sum((1 - arm_is_t) * F.col("__x"))
        .cast("bigint")
        .alias("__sx_c"),
        # second moments in decimal(38,0): x*x overflows bigint for
        # |x| > ~3.04e9 (ANSI throw), and the bucket fix above makes
        # the full bigint covariate range legal — so the moments must
        # survive it too. decimal(38,0) holds x^2 up to ~1e38 exactly;
        # the variance math downstream reads these as double anyway.
        F.sum(
            arm_is_t
            * F.col("__x").cast("decimal(38,0)")
            * F.col("__x").cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("__sxx_t"),
        F.sum(
            (1 - arm_is_t)
            * F.col("__x").cast("decimal(38,0)")
            * F.col("__x").cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("__sxx_c"),
    )
    out = moments.crossJoin(F.broadcast(pair_stats))
    nt = F.col("n_treatment").cast("double")
    nc = F.col("n_control").cast("double")
    # ANSI-safe guards: SMDs are undefined when either arm has < 2
    # units (sample variance needs n-1 > 0) — NULL, never a throw
    both_arms = (F.col("n_treatment") > 1) & (F.col("n_control") > 1)
    mean_t = F.when(
        F.col("n_treatment") > 0, F.col("__sx_t").cast("double") / nt
    )
    mean_c = F.when(
        F.col("n_control") > 0, F.col("__sx_c").cast("double") / nc
    )
    var_t = F.when(
        F.col("n_treatment") > 1,
        (F.col("__sxx_t").cast("double") - nt * mean_t * mean_t)
        / (nt - F.lit(1.0)),
    )
    var_c = F.when(
        F.col("n_control") > 1,
        (F.col("__sxx_c").cast("double") - nc * mean_c * mean_c)
        / (nc - F.lit(1.0)),
    )
    sd_pool = F.sqrt((var_t + var_c) / F.lit(2.0))
    # SMDs also need a POSITIVE pooled spread: when both arms are
    # constant (var_t + var_c == 0.0) the quotient would raise
    # DIVIDE_BY_ZERO under ANSI mode — gate to NULL instead (the
    # DuckDB oracle mirrors this with CASE WHEN sd_pool > 0).
    has_spread = both_arms & ((var_t + var_c) > F.lit(0.0))
    nm = F.col("n_matched").cast("double")
    smd_before = F.when(has_spread, (mean_t - mean_c) / sd_pool)
    smd_after = F.when(
        has_spread & (F.col("n_matched") > 0),
        (
            F.col("__sum_mt").cast("double") / nm
            - F.col("__sum_mc").cast("double") / nm
        )
        / sd_pool,
    )
    return out.select(
        "n_treatment",
        "n_control",
        "n_matched",
        F.round(F.when(F.col("n_treatment") > 0, nm / nt), 6).alias(
            "match_rate_r6"
        ),
        F.round(
            F.when(
                F.col("n_matched") > 0,
                F.col("__sum_adx").cast("double") / nm,
            ),
            6,
        ).alias("mean_abs_dx_r6"),
        F.round(smd_before, 6).alias("smd_before_r6"),
        F.round(smd_after, 6).alias("smd_after_r6"),
    )
