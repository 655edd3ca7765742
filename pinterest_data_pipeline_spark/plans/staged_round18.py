"""ROUND-18 STAGING SEED — implemented, tested, NOT driver-registered.

Seeded small (5 queries) per the standing backlog policy (promote
12/round, stage 4-5): same contract as every staging round — full
DuckDB oracles replayed value-for-value (strict-mirror parity at
sf0.001 + sf0.01 in tests/test_staged_round18.py) and behavior-pinning
unit tests; a later round registers them by pointing ``_stage`` at
``registry.register``.

The batch is the MODEL-TRUST tier — the audits a pipeline runs on any
scorer (learned or heuristic) before its scores steer selection, plus
the drift statistic model monitoring actually quotes:

- PSI (operators/infotheory.psi_fixed_bins): the Population Stability
  Index over fixed bins — the industry drift dashboard number whose
  0.1 / 0.25 action thresholds are quoted against THIS statistic, not
  against the registered JSD/KL nats; Laplace-smoothed so empty bins
  replay exactly.
- CALIBRATION (operators/calibration.calibration_bins_ece): the
  reliability table + ECE — "is the 0.9 bucket right 90% of the
  time", the gate before any score threshold is trusted.
- DISCRIMINATION (operators/calibration.roc_auc_binary): exact
  midrank-tie ROC AUC on the score histogram — the ranking-power
  companion (calibrated-but-useless and sharp-but-miscalibrated are
  different failures; thresholds need both numbers).
- DISTRIBUTION-FREE INTERVALS (operators/calibration.
  conformal_coverage): split-conformal coverage, integer-exact — the
  residual quantile rank and the coverage predicate never divide, so
  the finite-sample ≥ 1−α guarantee is replayable bit-for-bit.
- RATER CONSENSUS (operators/experiment.cohen_kappa): Cohen's kappa
  between two binary raters — chance-corrected agreement where raw
  agreement flatters imbalanced label rates; the labeling-audit gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.plans.registry import has_sql_line_comment
from pinterest_data_pipeline_spark.sources.parquet import load_table

STAGED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
STAGED_ORACLE: dict[str, str] = {}


def _stage(name: str, oracle: str | None = None):
    """registry.register's contract, into the round-18 staging dicts."""

    def deco(fn):
        if name in STAGED_QUERIES:
            raise ValueError(f"duplicate staged query name: {name}")
        if oracle is not None and has_sql_line_comment(oracle):
            raise ValueError(f"oracle for {name} contains a `--` SQL comment")
        STAGED_QUERIES[name] = fn
        if oracle is not None:
            STAGED_ORACLE[name] = " ".join(oracle.split())
        return fn

    return deco


# The shared scorer for the calibration + AUC pair: a logistic-shaped
# pseudo-probability from the order total, in integer micro-units.
# CAST(round(..)) is integral before the cast, so Spark's truncating
# and DuckDB's rounding double->bigint casts agree; the label is the
# F order status (NULL status NULL-propagates out on both sides).
_SCORE_SQL = (
    "CAST(round((o_totalprice * 1000000.0) / "
    "(o_totalprice + 250000.0)) AS BIGINT)"
)


# ------------------------------------------------------------- PSI drift
@_stage(
    "psi_price_drift_orders",
    oracle="""
    WITH b AS (
        SELECT CAST(LEAST(CAST(round(o_totalprice) AS BIGINT) // 50000,
                          9) AS INTEGER) AS bin,
               CAST(o_orderkey % 2 AS INTEGER) AS cur
        FROM orders
        WHERE o_totalprice IS NOT NULL AND o_orderkey IS NOT NULL
    ),
    counts AS (
        SELECT bin, CAST(sum(1 - cur) AS BIGINT) AS nb,
               CAST(sum(cur) AS BIGINT) AS nc
        FROM b GROUP BY bin
    ),
    spine AS (SELECT CAST(i AS INTEGER) AS bin_id
              FROM UNNEST(range(0, 10)) AS r(i)),
    cells AS (
        SELECT bin_id, COALESCE(nb, 0) AS n_base, COALESCE(nc, 0) AS n_cur
        FROM spine LEFT JOIN counts ON counts.bin = spine.bin_id
    ),
    tot AS (
        SELECT CAST(SUM(n_base) AS BIGINT) AS tb,
               CAST(SUM(n_cur) AS BIGINT) AS tc
        FROM cells
    ),
    terms AS (
        SELECT bin_id, CAST(n_base AS BIGINT) AS n_base,
               CAST(n_cur AS BIGINT) AS n_cur,
               ((n_cur + 1.0) / (tc + 10.0) - (n_base + 1.0) / (tb + 10.0))
               * (ln((n_cur + 1.0) / (tc + 10.0))
                  - ln((n_base + 1.0) / (tb + 10.0))) AS t
        FROM cells CROSS JOIN tot
    )
    SELECT bin_id, n_base, n_cur, round(t, 6) AS psi_term_r6 FROM terms
    UNION ALL
    SELECT CAST(-1 AS INTEGER), CAST(SUM(n_base) AS BIGINT),
           CAST(SUM(n_cur) AS BIGINT), round(SUM(t), 6)
    FROM terms
    ORDER BY bin_id
    """,
)
def psi_price_drift_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI of the order-total distribution, even-orderkey baseline vs
    odd-orderkey current, over ten fixed 50k-wide price bins
    (operators/infotheory.psi_fixed_bins). The deterministic halves
    make the planted truth "no drift": the hash-verified readout is
    the PSI arithmetic itself — all ten smoothed bin terms plus the
    total — at the known near-zero answer, exactly how a monitoring
    deployment would wire real week-over-week slices in.

    Scale: one map-side-combinable 10-key grouped count; spine join
    and total folds run on 10 rows."""
    from pinterest_data_pipeline_spark.operators.infotheory import (
        psi_fixed_bins,
    )

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull() & F.col("o_orderkey").isNotNull()
    )
    binned = o.select(
        F.expr(
            "cast(least(cast(round(o_totalprice) as bigint) div 50000, 9)"
            " as int)"
        ).alias("bin"),
        F.expr("cast(o_orderkey % 2 as int)").alias("cur"),
    )
    return psi_fixed_bins(binned, "bin", "cur", n_bins=10)


# ---------------------------------------------------- calibration + ECE
@_stage(
    "score_calibration_ece_orders",
    oracle=f"""
    WITH s AS (
        SELECT {_SCORE_SQL} AS su,
               CAST(o_orderstatus = 'F' AS BIGINT) AS y
        FROM orders
        WHERE o_totalprice IS NOT NULL AND o_orderstatus IS NOT NULL
    ),
    bins AS (
        SELECT CAST(LEAST((su * 10) // 1000000, 9) AS INTEGER) AS bin_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(su) AS BIGINT) AS ssu,
               CAST(sum(y) AS BIGINT) AS pos
        FROM s GROUP BY 1
    )
    SELECT bin_id, n,
           round(ssu / (n * 1000000.0), 6) AS mean_score_r6,
           round(pos / CAST(n AS DOUBLE), 6) AS frac_pos_r6,
           round(abs(ssu / (n * 1000000.0)
                     - pos / CAST(n AS DOUBLE)), 6) AS gap_r6
    FROM bins
    UNION ALL
    SELECT CAST(-1 AS INTEGER), CAST(SUM(n) AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           round(SUM(CAST(n AS DOUBLE)
                     * abs(ssu / (n * 1000000.0)
                           - pos / CAST(n AS DOUBLE)))
                 / CAST(SUM(n) AS DOUBLE), 6)
    FROM bins
    ORDER BY bin_id
    """,
)
def score_calibration_ece_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reliability bins + ECE of a deterministic logistic-shaped price
    score against the F order status
    (operators/calibration.calibration_bins_ece): the gate a quality
    classifier passes before its threshold steers selection, run here
    on a scorer both engines can rebuild bit-for-bit. The statuses are
    hash-uniform, so the planted truth is a flat ~1/3 positive rate
    against a sloped score — a KNOWN miscalibration profile the ten
    bin gaps and the ECE read out exactly.

    Scale: one map-side-combinable 10-key grouped aggregate; the total
    row folds from the 10-row bin relation."""
    from pinterest_data_pipeline_spark.operators.calibration import (
        calibration_bins_ece,
    )

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull() & F.col("o_orderstatus").isNotNull()
    )
    scored = o.select(
        F.expr(_SCORE_SQL).alias("su"),
        F.expr("CAST(o_orderstatus = 'F' AS BIGINT)").alias("y"),
    )
    return calibration_bins_ece(scored, "su", "y", n_bins=10)


# -------------------------------------------------------------- ROC AUC
@_stage(
    "roc_auc_price_status",
    oracle=f"""
    WITH s AS (
        SELECT {_SCORE_SQL} AS su,
               CAST(o_orderstatus = 'F' AS BIGINT) AS y
        FROM orders
        WHERE o_totalprice IS NOT NULL AND o_orderstatus IS NOT NULL
    ),
    hist AS (
        SELECT su, CAST(count(*) AS BIGINT) AS nv,
               CAST(sum(y) AS BIGINT) AS pv
        FROM s GROUP BY su
    ),
    scanned AS (
        SELECT *, CAST(SUM(nv) OVER (ORDER BY su ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) - nv AS BIGINT) AS cv
        FROM hist
    ),
    a AS (
        SELECT CAST(SUM(nv) AS BIGINT) AS n,
               CAST(SUM(pv) AS BIGINT) AS n_pos,
               CAST(SUM(nv) - SUM(pv) AS BIGINT) AS n_neg,
               CAST(COUNT(*) AS BIGINT) AS n_scores,
               CAST(SUM(pv * (2 * cv + nv + 1)) AS BIGINT) AS mr2
        FROM scanned
    )
    SELECT n, n_pos, n_neg, n_scores,
           round(CASE WHEN n_pos > 0 AND n_neg > 0 THEN
               (CAST(mr2 AS DOUBLE)
                - CAST(n_pos AS DOUBLE) * CAST(n_pos + 1 AS DOUBLE))
               / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
           END, 6) AS auc_r6
    FROM a
    """,
)
def roc_auc_price_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact midrank-tie ROC AUC of the SAME price score against the
    SAME F-status label as `score_calibration_ece_orders`
    (operators/calibration.roc_auc_binary) — the discrimination half
    of the scorer-trust pair: the statuses are hash-uniform and
    price-independent, so the planted truth is AUC ≈ 0.5, and the
    hash-verified value certifies the histogram midrank algebra
    (2·Σ midrank = Σ p_v·(2C_v + n_v + 1)) at that known answer.

    Scale: one grouped count over ≤ 1e6+1 micro-unit scores, one
    cumulative window over that BOUNDED histogram (constant in data
    size), one single-row fold."""
    from pinterest_data_pipeline_spark.operators.calibration import (
        roc_auc_binary,
    )

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull() & F.col("o_orderstatus").isNotNull()
    )
    scored = o.select(
        F.expr(_SCORE_SQL).alias("su"),
        F.expr("CAST(o_orderstatus = 'F' AS BIGINT)").alias("y"),
    )
    return roc_auc_binary(scored, "su", "y")


# ------------------------------------------------- conformal coverage
@_stage(
    "conformal_coverage_acctbal",
    oracle="""
    WITH u AS (
        SELECT COALESCE(CAST(c_mktsegment AS VARCHAR), '__NULL__') AS g,
               c_custkey AS k,
               CAST(round(c_acctbal * 100) AS BIGINT) AS x
        FROM customer
        WHERE c_acctbal IS NOT NULL AND c_custkey IS NOT NULL
    ),
    cal AS (SELECT * FROM u WHERE k % 2 = 0),
    tst AS (SELECT * FROM u WHERE k % 2 <> 0),
    st AS (
        SELECT g, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS s
        FROM cal GROUP BY g
    ),
    r AS (
        SELECT cal.g, abs(cal.x * st.n - st.s) AS res,
               ROW_NUMBER() OVER (
                   PARTITION BY cal.g
                   ORDER BY abs(cal.x * st.n - st.s), cal.k
               ) AS rn,
               (9 * (st.n + 1) + 9) // 10 AS kk
        FROM cal JOIN st USING (g)
    ),
    q AS (SELECT g, res AS q FROM r WHERE rn = kk),
    gs AS (
        SELECT st.g, st.n, st.s, q.q
        FROM st LEFT JOIN q USING (g)
    ),
    sc AS (
        SELECT gs.g, gs.n, gs.q, tst.x,
               CASE WHEN tst.x IS NOT NULL AND (gs.q IS NULL
                    OR abs(tst.x * gs.n - gs.s) <= gs.q)
                    THEN 1 ELSE 0 END AS cov
        FROM gs LEFT JOIN tst USING (g)
    )
    SELECT g AS c_mktsegment,
           CAST(MAX(n) AS BIGINT) AS n_calib,
           CAST(SUM(CASE WHEN x IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_test,
           CASE WHEN SUM(CASE WHEN x IS NOT NULL THEN 1 ELSE 0 END) > 0
                THEN CAST(SUM(cov) AS BIGINT) END AS n_covered,
           CASE WHEN SUM(CASE WHEN x IS NOT NULL THEN 1 ELSE 0 END) > 0
                THEN CAST((SUM(cov) * 1000000)
                     // SUM(CASE WHEN x IS NOT NULL THEN 1 ELSE 0 END)
                     AS BIGINT) END AS coverage_ppm,
           round(CAST(MAX(q) AS DOUBLE) / CAST(MAX(n) AS DOUBLE), 6)
               AS halfwidth_r6
    FROM sc GROUP BY g
    ORDER BY c_mktsegment
    """,
)
def conformal_coverage_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal 90% interval coverage of customer account
    balances per market segment
    (operators/calibration.conformal_coverage): even custkeys
    calibrate a per-segment mean predictor, the k-th smallest scaled
    residual (k = ceil(0.9(n+1))) sets the half-width, odd custkeys
    audit coverage. The guarantee under exchangeability is coverage
    >= 900000 ppm up to discreteness; the driver-verified row is the
    exact integer rank-and-predicate arithmetic behind it.

    Scale: one grouped moment aggregate (broadcast back), one
    residual-rank window partitioned by segment over the calibration
    half, one grouped coverage count over the test half."""
    from pinterest_data_pipeline_spark.operators.calibration import (
        conformal_coverage,
    )

    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(
            F.col("c_acctbal").isNotNull() & F.col("c_custkey").isNotNull()
        )
        .select(
            F.coalesce(
                F.col("c_mktsegment").cast("string"), F.lit("__NULL__")
            ).alias("seg"),
            F.col("c_custkey").alias("id"),
            F.expr("CAST(round(c_acctbal * 100) AS BIGINT)").alias("cents"),
        )
    )
    return conformal_coverage(
        cust, "seg", "id", "cents", alpha_num=1, alpha_den=10
    ).withColumnRenamed("seg", "c_mktsegment")


# ---------------------------------------------------------- Cohen kappa
@_stage(
    "cohen_kappa_doc_raters",
    oracle="""
    WITH r AS (
        SELECT CAST(n_chars >= 300 AS BIGINT) AS a,
               CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                    >= 55 AS BIGINT) AS b
        FROM documents
    ),
    f AS (SELECT a, b FROM r WHERE a IS NOT NULL AND b IS NOT NULL),
    c AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_agree,
               CAST(SUM(a) AS BIGINT) AS n_a_pos,
               CAST(SUM(b) AS BIGINT) AS n_b_pos
        FROM f
    )
    SELECT n, n_agree, n_a_pos, n_b_pos,
           round(CASE WHEN n > 0
                 THEN n_agree / CAST(n AS DOUBLE) END, 6) AS po_r6,
           round(CASE WHEN n > 0 THEN
                 (n_a_pos / CAST(n AS DOUBLE))
                 * (n_b_pos / CAST(n AS DOUBLE))
                 + (1.0 - n_a_pos / CAST(n AS DOUBLE))
                 * (1.0 - n_b_pos / CAST(n AS DOUBLE)) END, 6) AS pe_r6,
           round(CASE WHEN n > 0 AND
                 (n_a_pos / CAST(n AS DOUBLE))
                 * (n_b_pos / CAST(n AS DOUBLE))
                 + (1.0 - n_a_pos / CAST(n AS DOUBLE))
                 * (1.0 - n_b_pos / CAST(n AS DOUBLE)) < 1.0
                 THEN (n_agree / CAST(n AS DOUBLE)
                       - ((n_a_pos / CAST(n AS DOUBLE))
                          * (n_b_pos / CAST(n AS DOUBLE))
                          + (1.0 - n_a_pos / CAST(n AS DOUBLE))
                          * (1.0 - n_b_pos / CAST(n AS DOUBLE))))
                      / (1.0 - ((n_a_pos / CAST(n AS DOUBLE))
                                * (n_b_pos / CAST(n AS DOUBLE))
                                + (1.0 - n_a_pos / CAST(n AS DOUBLE))
                                * (1.0 - n_b_pos / CAST(n AS DOUBLE))))
           END, 6) AS kappa_r6
    FROM c
    """,
)
def cohen_kappa_doc_raters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic document raters
    (operators/experiment.cohen_kappa): rater A keeps docs with
    n_chars >= 300, rater B keeps docs with >= 55 tokens — two
    length-correlated gates whose agreement is far above chance but
    deliberately not 1, so the chance-corrected kappa lands strictly
    inside (0, 1) and the hash pins the full contingency fold
    (po, pe, kappa) rather than a degenerate endpoint.

    Scale: one tokenize projection feeding ONE conditional-sum
    aggregate — the whole contingency table folds map-side."""
    from pinterest_data_pipeline_spark.operators.experiment import (
        cohen_kappa,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        F.expr("CAST(n_chars >= 300 AS BIGINT)").alias("a"),
        F.expr(
            "CAST(size(regexp_extract_all(lower(text), '[a-z0-9]+', 0))"
            " >= 55 AS BIGINT)"
        ).alias("b"),
    )
    return cohen_kappa(docs, "a", "b")
