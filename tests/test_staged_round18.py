"""Round-18 seed parity + behavior: the model-trust tier (PSI drift,
calibration/ECE, exact ROC AUC, split-conformal coverage, Cohen's
kappa) must already pass the exact check the driver will run once
registered — strict-mirror value comparison against their DuckDB
oracles — with semantics pinned on constructed data.

Staged queries are deliberately NOT in plans/registry (rounds 14-17
are already staged/planned); see plans/staged_round18.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.plans.staged_round18 import (
    STAGED_ORACLE,
    STAGED_QUERIES,
)
from tests.oracle_utils import (
    compare_frames,
    duckdb_connection,
    exotic_oracle_columns,
)


def test_staged_queries_are_not_registered():
    import __spark_entry__ as entry_mod

    overlap = set(STAGED_QUERIES) & set(entry_mod.queries())
    assert not overlap, f"staged queries leaked into the registry: {overlap}"


def test_every_staged_query_has_an_oracle():
    assert set(STAGED_ORACLE) == set(STAGED_QUERIES)


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
@pytest.mark.parametrize("name", sorted(STAGED_QUERIES))
def test_staged_query_matches_oracle(spark, name, sf):
    d = f"/root/testdata/{sf}"
    spark_pdf = STAGED_QUERIES[name](spark, d).toPandas()
    con = duckdb_connection(d)
    try:
        assert not exotic_oracle_columns(con, STAGED_ORACLE[name])
        oracle_pdf = con.execute(STAGED_ORACLE[name]).fetchdf()
    finally:
        con.close()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{name}@{sf}: {problems}"
    assert len(spark_pdf) > 0


# ------------------------------------------------------------------ PSI


def _psi_df(spark, rows):
    return spark.createDataFrame(rows, "bin int, cur int")


def test_psi_identical_halves_read_zero(spark):
    """Identical bin distributions in both slices: every smoothed term
    and the total are exactly 0 (p_cur == p_base bin-for-bin)."""
    from pinterest_data_pipeline_spark.operators.infotheory import (
        psi_fixed_bins,
    )

    rows = [(b, c, ) for b in (0, 1, 2) for c in (0, 1) for _ in range(5)]
    out = {
        r["bin_id"]: r
        for r in psi_fixed_bins(
            _psi_df(spark, [(b, c) for b, c in rows]), "bin", "cur", 4
        ).collect()
    }
    assert set(out) == {-1, 0, 1, 2, 3}
    assert all(out[b]["psi_term_r6"] == 0.0 for b in (0, 1, 2, 3))
    assert out[-1]["psi_term_r6"] == 0.0
    assert out[3]["n_base"] == 0 and out[3]["n_cur"] == 0  # empty bin row


def test_psi_planted_shift_fires_and_matches_hand_value(spark):
    """All baseline mass in bin 0, all current mass in bin 1: PSI must
    exceed the 0.25 action threshold, and the bin-0 term matches the
    hand-computed smoothed value."""
    import math

    from pinterest_data_pipeline_spark.operators.infotheory import (
        psi_fixed_bins,
    )

    rows = [(0, 0)] * 40 + [(1, 1)] * 40
    out = {
        r["bin_id"]: r
        for r in psi_fixed_bins(_psi_df(spark, rows), "bin", "cur", 2)
        .collect()
    }
    # smoothing: n_bins = 2 → p0_base = 41/42, p0_cur = 1/42
    pb, pc = 41 / 42, 1 / 42
    hand = (pc - pb) * (math.log(pc) - math.log(pb))
    assert out[0]["psi_term_r6"] == pytest.approx(round(hand, 6), abs=1e-6)
    assert out[-1]["psi_term_r6"] > 0.25
    assert out[-1]["n_base"] == 40 and out[-1]["n_cur"] == 40


def test_psi_null_bins_and_flags_excluded(spark):
    from pinterest_data_pipeline_spark.operators.infotheory import (
        psi_fixed_bins,
    )

    rows = [(0, 0), (0, 1), (None, 1), (1, None)]
    out = {
        r["bin_id"]: r
        for r in psi_fixed_bins(_psi_df(spark, rows), "bin", "cur", 2)
        .collect()
    }
    assert out[-1]["n_base"] == 1 and out[-1]["n_cur"] == 1


# ----------------------------------------------------------------- ECE


def _score_df(spark, rows):
    return spark.createDataFrame(rows, "su long, y long")


def test_ece_perfectly_calibrated_bins_read_zero(spark):
    """A bin whose mean score equals its positive rate has gap 0; with
    every bin calibrated the ECE total is 0."""
    from pinterest_data_pipeline_spark.operators.calibration import (
        calibration_bins_ece,
    )

    # bin 2 (scores in [200000, 300000)): 4 rows at 250000, 1 positive
    # → conf 0.25, acc 0.25; bin 7: 4 rows at 750000, 3 positive
    rows = [(250_000, 1)] + [(250_000, 0)] * 3
    rows += [(750_000, 1)] * 3 + [(750_000, 0)]
    out = {
        r["bin_id"]: r
        for r in calibration_bins_ece(
            _score_df(spark, rows), "su", "y", 10
        ).collect()
    }
    assert set(out) == {-1, 2, 7}
    assert out[2]["gap_r6"] == 0.0 and out[7]["gap_r6"] == 0.0
    assert out[-1]["gap_r6"] == 0.0
    assert out[-1]["n"] == 8
    assert out[2]["mean_score_r6"] == pytest.approx(0.25, abs=1e-6)
    assert out[7]["frac_pos_r6"] == pytest.approx(0.75, abs=1e-6)


def test_ece_weights_bins_by_count_and_tops_out_scores(spark):
    """ECE is the count-weighted mean gap, and a score of exactly 1e6
    lands in the top bin (no phantom bin 10)."""
    from pinterest_data_pipeline_spark.operators.calibration import (
        calibration_bins_ece,
    )

    # bin 0: 3 rows, conf 0.0, acc 1.0 → gap 1.0; bin 9 (su = 1e6):
    # 1 row, conf 1.0, acc 1.0 → gap 0. ECE = 3/4 · 1.0 = 0.75
    rows = [(0, 1)] * 3 + [(1_000_000, 1)]
    out = {
        r["bin_id"]: r
        for r in calibration_bins_ece(
            _score_df(spark, rows), "su", "y", 10
        ).collect()
    }
    assert set(out) == {-1, 0, 9}
    assert out[0]["gap_r6"] == 1.0
    assert out[9]["gap_r6"] == 0.0
    assert out[-1]["gap_r6"] == pytest.approx(0.75, abs=1e-6)


# ----------------------------------------------------------------- AUC


def test_auc_separation_endpoints_and_ties(spark):
    """Perfect separation → 1.0; inverted → 0.0; a single tied score →
    0.5 by the midrank convention; one-class input → NULL."""
    from pinterest_data_pipeline_spark.operators.calibration import (
        roc_auc_binary,
    )

    perfect = [(100, 0)] * 5 + [(900, 1)] * 5
    inverted = [(900, 0)] * 5 + [(100, 1)] * 5
    tied = [(500, 0)] * 5 + [(500, 1)] * 5
    one_class = [(100, 1), (900, 1)]
    for rows, expect in (
        (perfect, 1.0),
        (inverted, 0.0),
        (tied, 0.5),
        (one_class, None),
    ):
        r = roc_auc_binary(_score_df(spark, rows), "su", "y").collect()[0]
        if expect is None:
            assert r["auc_r6"] is None
        else:
            assert r["auc_r6"] == pytest.approx(expect, abs=1e-6)


def test_auc_hand_value_with_partial_ties(spark):
    """Hand case: scores (1,2,2,3), labels (0,0,1,1). Midranks: 1,
    2.5, 2.5, 4 → Σ_pos = 6.5; AUC = (6.5 − 3)/(2·2) = 0.875."""
    from pinterest_data_pipeline_spark.operators.calibration import (
        roc_auc_binary,
    )

    rows = [(1, 0), (2, 0), (2, 1), (3, 1)]
    r = roc_auc_binary(_score_df(spark, rows), "su", "y").collect()[0]
    assert r["n_scores"] == 3
    assert r["auc_r6"] == pytest.approx(0.875, abs=1e-6)


# ------------------------------------------------------------ conformal


def _conf_df(spark, rows):
    return spark.createDataFrame(rows, "g string, k long, x long")


def test_conformal_hand_quantile_and_coverage(spark):
    """10 calib values 0..900 step 100 (even keys), predictor mean
    450 → residuals 50..450; k = ceil(0.9·11) = 10 → q_scaled is the
    largest residual (4500 at scale n=10). Test rows at 0 and 2000:
    |0·10 − 4500| = 4500 ≤ 4500 covered; |2000·10 − 4500| = 15500 not.
    """
    from pinterest_data_pipeline_spark.operators.calibration import (
        conformal_coverage,
    )

    rows = [("a", 2 * i, 100 * i) for i in range(10)]
    rows += [("a", 1, 0), ("a", 3, 2000)]
    r = conformal_coverage(_conf_df(spark, rows), "g", "k", "x").collect()[0]
    assert r["n_calib"] == 10 and r["n_test"] == 2
    assert r["n_covered"] == 1
    assert r["coverage_ppm"] == 500_000
    assert r["halfwidth_r6"] == pytest.approx(450.0, abs=1e-6)


def test_conformal_tiny_calibration_is_infinite_interval(spark):
    """n_calib < 9 at alpha = 0.1 → k > n: every test row covered,
    half-width NULL."""
    from pinterest_data_pipeline_spark.operators.calibration import (
        conformal_coverage,
    )

    rows = [("a", 0, 100), ("a", 2, 200)]  # k = ceil(0.9·3) = 3 > 2
    rows += [("a", 1, -10_000_000), ("a", 3, 10_000_000)]
    r = conformal_coverage(_conf_df(spark, rows), "g", "k", "x").collect()[0]
    assert r["n_covered"] == 2 and r["coverage_ppm"] == 1_000_000
    assert r["halfwidth_r6"] is None


def test_conformal_group_membership_contract(spark):
    """Calib-only groups appear with n_test = 0 and NULL coverage;
    test-only groups are excluded (nothing to cover them with)."""
    from pinterest_data_pipeline_spark.operators.calibration import (
        conformal_coverage,
    )

    rows = [("calib_only", 2 * i, 10 * i) for i in range(12)]
    rows += [("test_only", 1, 5), ("test_only", 3, 7)]
    out = {
        r["g"]: r
        for r in conformal_coverage(
            _conf_df(spark, rows), "g", "k", "x"
        ).collect()
    }
    assert set(out) == {"calib_only"}
    r = out["calib_only"]
    assert r["n_test"] == 0
    assert r["n_covered"] is None and r["coverage_ppm"] is None


def test_conformal_guarantee_on_planted_group(spark):
    """On an exchangeable planted sample the finite-sample guarantee
    coverage ≥ 1 − α must hold exactly (deterministic inputs)."""
    from pinterest_data_pipeline_spark.operators.calibration import (
        conformal_coverage,
    )

    # values follow the same deterministic pattern in both halves
    rows = [("g", k, (k * 37) % 1000) for k in range(400)]
    r = conformal_coverage(_conf_df(spark, rows), "g", "k", "x").collect()[0]
    assert r["n_calib"] == 200 and r["n_test"] == 200
    assert r["coverage_ppm"] >= 900_000


# ---------------------------------------------------------------- kappa


def _rater_df(spark, rows):
    return spark.createDataFrame(rows, "a long, b long")


def test_kappa_perfect_and_chance_and_degenerate(spark):
    """Identical raters → κ = 1; hand 2×2 with known κ; both raters
    constant and identical → p_e = 1 → κ NULL (never a throw); NULL
    adjudications excluded."""
    from pinterest_data_pipeline_spark.operators.experiment import (
        cohen_kappa,
    )

    perfect = [(1, 1)] * 3 + [(0, 0)] * 5
    r = cohen_kappa(_rater_df(spark, perfect), "a", "b").collect()[0]
    assert r["kappa_r6"] == 1.0 and r["po_r6"] == 1.0

    # hand case: a=(1,1,0,0), b=(1,0,1,0) → po=0.5, pe=0.5, κ=0
    hand = [(1, 1), (1, 0), (0, 1), (0, 0)]
    r = cohen_kappa(_rater_df(spark, hand), "a", "b").collect()[0]
    assert r["po_r6"] == 0.5 and r["pe_r6"] == 0.5
    assert r["kappa_r6"] == 0.0

    degen = [(1, 1)] * 4
    r = cohen_kappa(_rater_df(spark, degen), "a", "b").collect()[0]
    assert r["pe_r6"] == 1.0 and r["kappa_r6"] is None

    with_nulls = [(1, 1), (None, 1), (0, None), (0, 0)]
    r = cohen_kappa(_rater_df(spark, with_nulls), "a", "b").collect()[0]
    assert r["n"] == 2 and r["n_agree"] == 2


def test_ece_out_of_domain_scores_never_collide_with_total_row(spark):
    """A negative micro-unit score must be EXCLUDED, not minted into a
    bin_id of -1 that aliases the total row; scores above 1e6 are
    excluded symmetrically."""
    from pinterest_data_pipeline_spark.operators.calibration import (
        calibration_bins_ece,
    )

    rows = [(-5, 1), (1_000_001, 1), (250_000, 1), (250_000, 0)]
    out = calibration_bins_ece(
        _score_df(spark, rows), "su", "y", 10
    ).collect()
    by_bin = {}
    for r in out:
        assert r["bin_id"] not in by_bin, "duplicate bin_id rows"
        by_bin[r["bin_id"]] = r
    assert set(by_bin) == {-1, 2}
    assert by_bin[-1]["n"] == 2  # only the in-domain rows


def test_auc_out_of_domain_scores_excluded(spark):
    from pinterest_data_pipeline_spark.operators.calibration import (
        roc_auc_binary,
    )

    rows = [(-5, 0), (1_000_001, 1), (100, 0), (900, 1)]
    r = roc_auc_binary(_score_df(spark, rows), "su", "y").collect()[0]
    assert r["n"] == 2 and r["n_pos"] == 1
    assert r["auc_r6"] == pytest.approx(1.0, abs=1e-6)
