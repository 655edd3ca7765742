"""Model-trust gates over scored rows — the audits a pipeline runs on
any learned (or heuristic) scorer before its scores steer selection:

- :func:`calibration_bins_ece`: the reliability table + Expected
  Calibration Error. A quality classifier whose 0.9 bucket is right
  61% of the time poisons every threshold downstream; ECE is that gap
  as one number, the bins are the dashboard behind it.
- :func:`conformal_coverage`: split-conformal prediction-interval
  coverage, EXACT. The distribution-free guarantee ("90% of held-out
  values fall inside the interval, no model assumptions") is only as
  good as its arithmetic — this implementation never divides until the
  final readout, so the quantile rank and the coverage predicate are
  integer-exact and replay bit-for-bit in any engine.

Exactness discipline (the house rule): scores enter as INTEGER
micro-units, labels as 0/1 bigints, residuals as scaled bigints; every
cross-row sum is exact, and doubles appear only in the final rounded
readout columns. Degenerate inputs yield NULL, never a throw
(ANSI-safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCORE_SCALE = 1_000_000  # scores are integer micro-units in [0, 1e6]


def calibration_bins_ece(
    df: DataFrame,
    score_micros_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability bins + ECE for an integer micro-unit score in
    [0, 1e6] against a 0/1 label. Returns one row per NON-EMPTY bin:

        (bin_id, n, mean_score_r6, frac_pos_r6, gap_r6)

    plus one TOTAL row (bin_id = -1) where ``n`` is the scored-row
    total and ``gap_r6`` carries the ECE — the bin-weighted mean
    |confidence − accuracy| (mean_score/frac_pos are NULL there; empty
    bins hold zero weight so omitting their rows changes nothing).

    bin_id = min(score·n_bins div 1e6, n_bins − 1), integer floor —
    a score of exactly 1e6 lands in the top bin instead of a phantom
    n-th one. Rows with a NULL score or label are excluded up front
    (they can neither place in a bin nor count as an outcome), and so
    are scores OUTSIDE [0, 1e6] — a value outside that range is not a
    probability, and a negative one would otherwise mint a bin_id that
    collides with the total row's −1 sentinel.

    Scale: ONE map-side-combinable grouped aggregate over ≤ n_bins
    keys; the total row folds from the bin relation (n_bins rows).
    Doubles appear only inside the final round(...) readouts; the
    sums they divide are exact bigints."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    base = df.select(
        F.col(score_micros_col).cast("bigint").alias("__s"),
        F.col(label_col).cast("bigint").alias("__y"),
    ).filter(
        F.col("__y").isNotNull()
        & F.col("__s").isNotNull()
        & (F.col("__s") >= 0)
        & (F.col("__s") <= SCORE_SCALE)
    )
    bins = (
        base.groupBy(
            F.least(
                F.expr(f"(__s * {int(n_bins)}) div {SCORE_SCALE}"),
                F.lit(int(n_bins) - 1),
            )
            .cast("int")
            .alias("bin_id")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("__s").cast("bigint").alias("__su"),
            F.sum("__y").cast("bigint").alias("__pos"),
        )
        .localCheckpoint(eager=True)
    )
    nd = F.col("n").cast("double")
    conf = F.col("__su").cast("double") / (nd * F.lit(float(SCORE_SCALE)))
    acc = F.col("__pos").cast("double") / nd
    per_bin = bins.select(
        "bin_id",
        "n",
        F.round(conf, 6).alias("mean_score_r6"),
        F.round(acc, 6).alias("frac_pos_r6"),
        F.round(F.abs(conf - acc), 6).alias("gap_r6"),
    )
    # ECE = Σ_b (n_b/N)·|conf_b − acc_b|: fold the UNROUNDED per-bin
    # gaps weighted by exact counts; the only rounding is the final 6dp
    total = bins.agg(
        F.lit(-1).cast("int").alias("bin_id"),
        F.sum("n").cast("bigint").alias("n"),
        F.lit(None).cast("double").alias("mean_score_r6"),
        F.lit(None).cast("double").alias("frac_pos_r6"),
        F.round(
            F.when(
                F.sum("n") > 0,
                F.sum(nd * F.abs(conf - acc)) / F.sum("n").cast("double"),
            ),
            6,
        ).alias("gap_r6"),
    )
    return per_bin.unionByName(total).orderBy("bin_id")


def conformal_coverage(
    df: DataFrame,
    group_col: str,
    key_col: str,
    value_col: str,
    alpha_num: int = 1,
    alpha_den: int = 10,
) -> DataFrame:
    """Split-conformal coverage audit per group, integer-exact.

    The split is deterministic on the key: EVEN keys calibrate, ODD
    keys test. The per-group predictor is the calibration mean; the
    nonconformity score is the absolute residual; the interval
    half-width is the k-th smallest calibration residual with
    k = ⌈(1 − α)(n_calib + 1)⌉ — the classic split-conformal rank
    whose finite-sample guarantee is coverage ≥ 1 − α.

    NO DIVISION HAPPENS IN THE DECISION PATH: with S = Σ calib values
    and n = n_calib, the residual |x − S/n| is compared as the scaled
    bigint |x·n − S|, both for the quantile rank (ties broken by the
    key so the k-th element is well-defined and deterministic) and for
    the test predicate |x_t·n − S| ≤ q. When k > n (tiny calibration
    sets) the conformal interval is infinite: every test row is
    covered and the half-width reads NULL.

    Returns one row per group:

        (group_col, n_calib, n_test, n_covered, coverage_ppm,
         halfwidth_r6)

    ``coverage_ppm`` = n_covered·1e6 div n_test (exact floor ppm; NULL
    when the group has no test rows), ``halfwidth_r6`` = q/n in the
    value's own units. Groups with NO calibration rows predict nothing
    and are EXCLUDED from the audit (there is no interval to cover);
    calibration-only groups appear with n_test = 0 and NULL coverage.
    NULL values/keys are excluded up front; a NULL group is audited as
    its own class.

    Scale: one grouped moment aggregate (broadcast back — |groups|
    rows), one residual-rank window PARTITIONED BY GROUP over the
    calibration half only, one final grouped count over the test
    half. No data-sized joins beyond the broadcast of group stats.
    Magnitude guard: |x|·n_calib must stay under 2^63 (holds to
    ~9e12 calibration rows per group at 1e6-unit values; rescale the
    value units beyond)."""
    if not (0 < alpha_num < alpha_den):
        raise ValueError(
            f"alpha must be in (0,1): got {alpha_num}/{alpha_den}"
        )
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(key_col).cast("bigint").alias("__k"),
        F.col(value_col).cast("bigint").alias("__x"),
    ).filter(F.col("__x").isNotNull() & F.col("__k").isNotNull())
    is_calib = F.pmod(F.col("__k"), F.lit(2)) == 0
    calib = base.filter(is_calib)
    test = base.filter(~is_calib)
    stats = calib.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum("__x").cast("bigint").alias("__sum"),
    )
    # k-th smallest scaled residual per group; rank ties broken by key
    from pyspark.sql import Window

    ranked = (
        calib.join(F.broadcast(stats), "__g")
        .withColumn(
            "__r", F.abs(F.col("__x") * F.col("__n") - F.col("__sum"))
        )
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("__g").orderBy("__r", "__k")
            ),
        )
    )
    # k = ceil((den - num)·(n + 1) / den) in exact integers
    k = F.expr(
        f"(({alpha_den - alpha_num}) * (__n + 1) + {alpha_den} - 1) "
        f"div {alpha_den}"
    )
    q = (
        ranked.filter(F.col("__rn") == k)
        .select("__g", F.col("__r").alias("__q"))
    )
    # k > n ⇒ no row matched ⇒ left join leaves __q NULL = infinite
    gstats = stats.join(F.broadcast(q), "__g", "left").withColumn(
        "__finite", F.col("__q").isNotNull()
    )
    # the only data-sized join, kept broadcastable: INNER test×gstats
    # (a test-only group has no interval to cover — excluded by
    # contract); calib-only groups re-enter via the tiny left join
    # below with n_test = 0
    scored = test.join(F.broadcast(gstats), "__g")
    covered = F.when(
        ~F.col("__finite")
        | (
            F.abs(F.col("__x") * F.col("__n") - F.col("__sum"))
            <= F.col("__q")
        ),
        1,
    ).otherwise(0)
    tstats = scored.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("__nt"),
        F.sum(covered).cast("bigint").alias("__nc"),
    )
    out = gstats.join(F.broadcast(tstats), "__g", "left")
    n_test = F.coalesce(F.col("__nt"), F.lit(0)).cast("bigint")
    return out.select(
        F.col("__g").alias(group_col),
        F.col("__n").alias("n_calib"),
        n_test.alias("n_test"),
        F.when(n_test > 0, F.col("__nc")).alias("n_covered"),
        F.when(
            n_test > 0,
            F.expr("(__nc * 1000000) div __nt"),
        )
        .cast("bigint")
        .alias("coverage_ppm"),
        F.round(
            F.when(
                F.col("__finite"),
                F.col("__q").cast("double") / F.col("__n").cast("double"),
            ),
            6,
        ).alias("halfwidth_r6"),
    ).orderBy(group_col)


def roc_auc_binary(
    df: DataFrame,
    score_micros_col: str,
    label_col: str,
) -> DataFrame:
    """Exact ROC AUC of an integer micro-unit score against a 0/1
    label, with the standard midrank tie treatment — the DISCRIMINATION
    reading beside :func:`calibration_bins_ece`'s calibration one (a
    scorer can be perfectly calibrated and useless, or sharp and
    miscalibrated; selection thresholds need both numbers).

    AUC = (Σ_{positives} midrank − n_pos(n_pos+1)/2) / (n_pos·n_neg),
    computed on the SCORE HISTOGRAM (the gini_skew_profile discipline):
    for distinct score v with n_v rows (p_v positive) and C_v rows
    strictly below, every row of v has midrank C_v + (n_v+1)/2, so

        2·Σ_pos midrank = Σ_v p_v·(2·C_v + n_v + 1)

    is exact — summed in decimal(38,0), since a concentrated score can
    make single terms approach 2n² and overflow bigint past ~2e9 rows
    — and the single rounded division happens last.
    Returns ONE row: (n, n_pos, n_neg, n_scores, auc_r6); AUC is NULL
    when either class is empty (undefined, never a throw). NULL scores
    or labels are excluded up front, as are scores outside [0, 1e6]
    (the same domain contract as calibration_bins_ece — outside it the
    bounded-histogram scale claim below is void).

    Scale: one map-side-combinable grouped count over ≤ 1e6 + 1
    distinct micro-unit scores, one cumulative window over that
    BOUNDED histogram (constant in data size — this is why the score
    contract is integer micro-units), one single-row fold."""
    from pyspark.sql import Window

    base = df.select(
        F.col(score_micros_col).cast("bigint").alias("__s"),
        F.col(label_col).cast("bigint").alias("__y"),
    ).filter(
        F.col("__y").isNotNull()
        & F.col("__s").isNotNull()
        & (F.col("__s") >= 0)
        & (F.col("__s") <= SCORE_SCALE)
    )
    hist = base.groupBy("__s").agg(
        F.count(F.lit(1)).cast("bigint").alias("__nv"),
        F.sum("__y").cast("bigint").alias("__pv"),
    )
    w = Window.orderBy("__s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    scanned = hist.withColumn(
        "__cv", F.sum("__nv").over(w) - F.col("__nv")
    )
    out = scanned.agg(
        F.sum("__nv").cast("bigint").alias("n"),
        F.sum("__pv").cast("bigint").alias("n_pos"),
        (F.sum("__nv") - F.sum("__pv")).cast("bigint").alias("n_neg"),
        F.count(F.lit(1)).cast("bigint").alias("n_scores"),
        F.sum(
            F.col("__pv").cast("decimal(38,0)")
            * (2 * F.col("__cv") + F.col("__nv") + 1).cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("__mr2"),
    )
    auc = (
        F.col("__mr2").cast("double")
        - F.col("n_pos").cast("double") * (F.col("n_pos") + 1).cast("double")
    ) / (
        F.lit(2.0)
        * F.col("n_pos").cast("double")
        * F.col("n_neg").cast("double")
    )
    return out.select(
        "n",
        "n_pos",
        "n_neg",
        "n_scores",
        F.round(
            F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0), auc), 6
        ).alias("auc_r6"),
    )
