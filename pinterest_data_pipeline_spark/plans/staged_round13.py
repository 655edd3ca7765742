"""ROUND-13 BATCH — fully promoted to the driver surface in round 12.

Rounds 9-12 are already staged (registry ROTATION NOTES;
plans/staged_round{9,10,11,12}.py), so this seed stages five windows
out; later rounds extend it toward a full batch before its window
(the round-11 precedent: seeded at 4, extended to 10). Same contract
as every staging round: full DuckDB oracles replayed value-for-value
(strict-mirror parity at sf0.001 + sf0.01 in
tests/test_staged_round13.py) and behavior-pinning unit tests.

The seed fills three family gaps:

- k_core_purchasing_profile (operators/kcore): the graph-density tier
  cut — reachability (CC), communities (LPA), importance (PageRank /
  HITS) exist; "which subgraph is dense enough to trust" did not.
- l_diversity_docs (operators/privacy.l_diversity_audit): the
  homogeneity-attack gate k-anonymity alone misses — k_anonymity_docs
  measures class SIZE, this measures sensitive-value VARIETY.
- dirichlet_lm_doc_scores (operators/ranking.dirichlet_lm_scores):
  query-likelihood with Dirichlet smoothing — the probabilistic
  sibling completing the lexical ranking family (TF-IDF, BM25,
  unigram/bigram LM), postings-bounded via the background-term
  decomposition.
- err_at_10_length_ranker (operators/ranking.err_at_k): the
  cascade-model metric beside NDCG's position-discount one — same
  ranker, same grades, the top-heaviness reading.
- poststratified_lift_user_spend (operators/experiment.
  post_stratified_lift): the third variance-reduction reading beside
  CUPED and winsorization — reweighting away stratum-composition
  imbalance.

Round-9 extension (seed 5 → full batch of 10):

- survivorship_golden_record (operators/linkage.
  survivorship_golden_record): the merge step AFTER Fellegi-Sunter
  scoring — field-level survivorship (longest / latest / max rules)
  collapsing linked clusters to audited golden records, completing
  the record-linkage plane (r8 verdict item 7).
- good_turing_bigram_coverage (operators/text.good_turing_coverage):
  unseen-probability-mass P₀ = N₁/N and Katz discounts
  r* = (r+1)·N_{r+1}/N_r from the bigram frequency-of-frequencies —
  the "is this corpus slice big enough" reading.
- kmv_distinct_price_points (operators/sketches.kmv_distinct): the
  K-minimum-values distinct sketch with an exact-join error gate —
  the third explicitly-constructed sketch beside count-min and
  MinHash, mergeable by union-and-trim.
- event_burstiness_by_type (operators/robust_stats.
  dispersion_index): the Fano factor over the global hourly slot
  grid — burstiness beside the family's memory/drift/level-shift/
  seasonality readings; empty slots count.
- srm_assignment_audit (operators/experiment.srm_audit): chi-square
  goodness-of-fit of observed vs CONFIGURED assignment ratios — the
  sample-ratio-mismatch trust gate (one-way), distinct from the
  registered two-way chi_square_independence; includes a deliberate
  stale-config ramp that fires the flag once n is large enough.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.plans.registry import (
    has_sql_line_comment,
    register,
)
from pinterest_data_pipeline_spark.sources.parquet import load_table

STAGED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
STAGED_ORACLE: dict[str, str] = {}


# ROUND-12 PROMOTIONS: the full batch of 10, per the registry
# ROTATION NOTES pre-plan — this file is now fully promoted.
PROMOTED_IN_ROUND12 = {
    "k_core_purchasing_profile",
    "l_diversity_docs",
    "dirichlet_lm_doc_scores",
    "err_at_10_length_ranker",
    "poststratified_lift_user_spend",
    "survivorship_golden_record",
    "good_turing_bigram_coverage",
    "kmv_distinct_price_points",
    "event_burstiness_by_type",
    "srm_assignment_audit",
}

PROMOTED = PROMOTED_IN_ROUND12


def _stage(name: str, oracle: str | None = None):
    """registry.register's contract, into the round-13 staging dicts;
    names in PROMOTED also hit registry.register proper (driver
    surface). register() validates those; local-only names validate
    here."""

    def deco(fn):
        if name in PROMOTED:
            register(name, oracle)(fn)
        else:
            if name in STAGED_QUERIES:
                raise ValueError(f"duplicate staged query name: {name}")
            if oracle is not None and has_sql_line_comment(oracle):
                raise ValueError(
                    f"oracle for {name} contains a `--` SQL comment"
                )
        STAGED_QUERIES[name] = fn
        if oracle is not None:
            STAGED_ORACLE[name] = " ".join(oracle.split())
        return fn

    return deco


def _kcore_round_sql(prev: str, cur: str, k: int) -> str:
    return f"""
    keep{cur} AS (
        SELECT src AS node FROM e{prev} GROUP BY src
        HAVING count(*) >= {k}
    ),
    e{cur} AS (
        SELECT e.src, e.dst FROM e{prev} e
        JOIN keep{cur} a ON e.src = a.node
        JOIN keep{cur} b ON e.dst = b.node
    )"""


@_stage(
    "k_core_purchasing_profile",
    oracle=f"""
    WITH ed AS (
        SELECT l_suppkey * 2 AS a, l_partkey * 2 + 1 AS b
        FROM lineitem GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    e0 AS (
        SELECT a AS src, b AS dst FROM ed
        UNION ALL SELECT b, a FROM ed
    ),
    {_kcore_round_sql('0', '1', 4)},
    {_kcore_round_sql('1', '2', 4)},
    {_kcore_round_sql('2', '3', 4)}
    SELECT 0 AS peel_round,
           CAST(count(DISTINCT src) AS BIGINT) AS n_nodes,
           CAST(count(*) // 2 AS BIGINT) AS n_edges FROM e0
    UNION ALL
    SELECT 1, CAST(count(DISTINCT src) AS BIGINT),
           CAST(count(*) // 2 AS BIGINT) FROM e1
    UNION ALL
    SELECT 2, CAST(count(DISTINCT src) AS BIGINT),
           CAST(count(*) // 2 AS BIGINT) FROM e2
    UNION ALL
    SELECT 3, CAST(count(DISTINCT src) AS BIGINT),
           CAST(count(*) // 2 AS BIGINT) FROM e3
    """,
)
def k_core_purchasing_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-core peeling profile of the repeat-purchase supplier↔part
    graph (operators/kcore): (nodes, edges) after each of three peel
    rounds — how fast the graph collapses under the degree-4 threshold
    is the density readout none of the other graph operators provides.
    Fixed rounds, unrolled SQL oracle (the LPA / pagerank fixed-point
    precedent); exact integer counting throughout."""
    from pinterest_data_pipeline_spark.operators.kcore import (
        k_core_peel_profile,
    )

    li = load_table(spark, sf_dir, "lineitem")
    ed = (
        li.groupBy(
            (F.col("l_suppkey") * 2).alias("a"),
            (F.col("l_partkey") * 2 + 1).alias("b"),
        )
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") >= 2)
        .select("a", "b")
    )
    edges = ed.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(ed.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    return k_core_peel_profile(edges, k=4, rounds=3)


@_stage(
    "l_diversity_docs",
    oracle="""
    WITH g AS (
        SELECT lang, n_chars // 500 AS len_bucket,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT COALESCE(CAST(source AS VARCHAR),
                    '__NULL__')) AS BIGINT) AS l
        FROM documents GROUP BY 1, 2
    )
    SELECT CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(min(l) AS BIGINT) AS l_min,
           CAST(sum(CASE WHEN l < 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS classes_below_l,
           CAST(sum(CASE WHEN l < 2 THEN n ELSE 0 END) AS BIGINT)
               AS rows_below_l,
           round(CAST(sum(CASE WHEN l >= 2 THEN n ELSE 0 END) AS DOUBLE)
                 / CAST(sum(n) AS DOUBLE), 6) AS diverse_share_r6
    FROM g
    """,
)
def l_diversity_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-ℓ-diversity audit (ℓ=2) of documents under the
    quasi-identifier set (lang, 500-char length bucket) with SOURCE as
    the sensitive attribute (operators/privacy.l_diversity_audit) —
    the homogeneity-attack gate: a class may be large (k-anonymous,
    cf. k_anonymity_docs) yet expose its members' source because every
    row in it shares one. Pure integer class counting, one grouped
    aggregate."""
    from pinterest_data_pipeline_spark.operators.privacy import (
        l_diversity_audit,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", F.expr("n_chars div 500").alias("len_bucket"), "source"
    )
    return l_diversity_audit(docs, ["lang", "len_bucket"], "source", 2)


_QLM_TERMS = ["batch", "hash", "merge", "row", "table"]
_QLM_MU = 2000.0


@_stage(
    "dirichlet_lm_doc_scores",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '')
                   AS t
        FROM documents
    ),
    base AS (
        SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
               list_filter(t, x -> list_contains(
                   {_QLM_TERMS!r}, x)) AS hits
        FROM toks
    ),
    consts AS (SELECT CAST(sum(dl) AS BIGINT) AS tot_len FROM base),
    tf AS (
        SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, dl, unnest(hits) AS term FROM base)
        GROUP BY doc_id, dl, term
    ),
    cf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY term),
    qstats AS (
        SELECT list_sum(list(ln({_QLM_MU} * CAST(cf AS DOUBLE)
                                / CAST(c.tot_len AS DOUBLE))
                        ORDER BY term)) AS a,
               CAST(count(*) AS BIGINT) AS m
        FROM cf CROSS JOIN consts c
    ),
    corr AS (
        SELECT tf.doc_id, tf.dl, tf.term,
               ln(CAST(tf.tf AS DOUBLE)
                  + {_QLM_MU} * CAST(cf.cf AS DOUBLE)
                    / CAST(c.tot_len AS DOUBLE))
               - ln({_QLM_MU} * CAST(cf.cf AS DOUBLE)
                    / CAST(c.tot_len AS DOUBLE)) AS corr
        FROM tf JOIN cf USING (term) CROSS JOIN consts c
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matched,
           round(any_value(q.a)
                 - any_value(q.m) * ln(CAST(any_value(dl) AS DOUBLE)
                                       + {_QLM_MU})
                 + list_sum(list(corr ORDER BY term)), 6) AS qlm_r6
    FROM corr CROSS JOIN qstats q GROUP BY doc_id
    """,
)
def dirichlet_lm_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query likelihood (μ=2000) of every matching
    document against the same five-term bag bm25_doc_scores ranks
    (operators/ranking.dirichlet_lm_scores) — the probabilistic
    ranking function beside BM25's heuristic one, kept
    postings-bounded by folding unmatched query terms into two corpus
    constants (A, m). Sorted-term folds make the doubles
    engine-identical; one final round(…, 6)."""
    from pinterest_data_pipeline_spark.operators.ranking import (
        dirichlet_lm_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    return dirichlet_lm_scores(docs, _QLM_TERMS, mu=_QLM_MU)


@_stage(
    "err_at_10_length_ranker",
    oracle=r"""
    WITH feats AS (
        SELECT doc_id, source, n_chars,
               CAST(3000 * len(list_filter(
                        regexp_split_to_array(lower(trim(text)), '\s+'),
                        t -> list_contains(
                            ['and','is','of','that','the','to'], t)))
                    - 2000 * length(regexp_replace(
                        text, '[a-zA-Z0-9_\s]', '', 'g'))
                    - 2000 * length(regexp_replace(text, '[^0-9]', '', 'g'))
                    - 100 * len(regexp_split_to_array(trim(text), '\s+'))
                    AS BIGINT) AS margin
        FROM documents
    ),
    g AS (
        SELECT doc_id, source, n_chars,
               CAST(10 - ntile(10) OVER (PARTITION BY source
                   ORDER BY margin DESC, doc_id ASC) AS BIGINT) AS grade
        FROM feats
    ),
    r AS (
        SELECT source, grade,
               ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY n_chars DESC, doc_id ASC) AS rnk
        FROM g
    ),
    probs AS (
        SELECT source, rnk,
               (power(2.0, CAST(grade AS DOUBLE)) - 1.0) / 512.0 AS rp
        FROM r WHERE rnk <= 10
    ),
    termed AS (
        SELECT source, rnk,
               rp / CAST(rnk AS DOUBLE)
               * exp(COALESCE(sum(ln(1.0 - rp)) OVER (
                     PARTITION BY source ORDER BY rnk
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0.0)) AS term
        FROM probs
    )
    SELECT source, round(list_sum(list(term ORDER BY rnk)), 6) AS err_r6
    FROM termed GROUP BY source
    """,
)
def err_at_10_length_ranker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ERR@10 per source (operators/ranking.err_at_k) of the SAME
    length ranker and ntile-graded relevance
    ndcg_length_ranker_by_source evaluates — the cascade-model reading
    beside NDCG's position-discount one: a ranker that parks one
    near-perfect document at rank 1 scores high here even when its
    tail is mediocre, which is exactly the difference a feed team
    debates. Grades are 0..9, so R = (2^g − 1)/512 < 1 and the
    survival product never collapses to an exact zero."""
    from pinterest_data_pipeline_spark.operators.ranking import err_at_k

    docs = load_table(spark, sf_dir, "documents")
    stop_arr = F.array(*[F.lit(t) for t in
                         ["and", "is", "of", "that", "the", "to"]])
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    margin = (
        F.lit(3000)
        * F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
        - F.lit(2000)
        * F.length(F.regexp_replace(F.col("text"), r"[a-zA-Z0-9_\s]", ""))
        - F.lit(2000)
        * F.length(F.regexp_replace(F.col("text"), r"[^0-9]", ""))
        - F.lit(100) * F.size(F.split(F.trim(F.col("text")), r"\s+"))
    ).cast("long")
    feats = docs.select("doc_id", "source", "n_chars", margin.alias("m"))
    graded = feats.select(
        "source",
        (
            F.lit(10)
            - F.ntile(10).over(
                Window.partitionBy("source").orderBy(
                    F.col("m").desc(), F.col("doc_id").asc()
                )
            )
        )
        .cast("long")
        .alias("grade"),
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.col("n_chars").desc(), F.col("doc_id").asc()
            )
        )
        .alias("rnk"),
    )
    return err_at_k(graded, "source", "rnk", "grade", k=10, g_max=9)


@_stage(
    "poststratified_lift_user_spend",
    oracle="""
    WITH u AS (
        SELECT user_id,
               CASE WHEN CAST(concat('0x', substr(md5(concat('exp1:',
                        CAST(user_id AS VARCHAR))), 1, 8)) AS BIGINT)
                        % 2 = 0
               THEN 'treatment' ELSE 'control' END AS arm,
               CAST(sum(CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_pre,
               CAST(sum(CASE WHEN day(ts) > 15
                        THEN CAST(round(value * 100) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS cents
        FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
    ),
    s AS (
        SELECT arm,
               CASE WHEN n_pre = 0 THEN 0 WHEN n_pre <= 2 THEN 1
                    WHEN n_pre <= 5 THEN 2 ELSE 3 END AS stratum,
               cents
        FROM u
    ),
    cells AS (
        SELECT stratum,
               CAST(sum(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END)
                    AS BIGINT) AS nt,
               CAST(sum(CASE WHEN arm = 'treatment' THEN cents ELSE 0 END)
                    AS BIGINT) AS st,
               CAST(sum(CASE WHEN arm = 'control' THEN 1 ELSE 0 END)
                    AS BIGINT) AS nc,
               CAST(sum(CASE WHEN arm = 'control' THEN cents ELSE 0 END)
                    AS BIGINT) AS sc
        FROM s GROUP BY 1
    ),
    used AS (SELECT * FROM cells WHERE nt > 0 AND nc > 0),
    ps AS (
        SELECT CAST(count(*) AS BIGINT) AS n_strata_used,
               list_sum(list(
                   CAST(nt + nc AS DOUBLE)
                   * (CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
                      - CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE))
                   ORDER BY stratum))
               / CAST(sum(nt + nc) AS DOUBLE) AS ps_lift
        FROM used
    ),
    tot AS (
        SELECT CAST(sum(nt) AS BIGINT) AS n_treat,
               CAST(sum(nc) AS BIGINT) AS n_ctrl,
               CAST(sum(st) AS DOUBLE) / CAST(sum(nt) AS DOUBLE)
               - CAST(sum(sc) AS DOUBLE) / CAST(sum(nc) AS DOUBLE) AS raw
        FROM cells
    )
    SELECT n_treat, n_ctrl, n_strata_used,
           round(raw, 6) AS raw_lift_r6,
           round(ps_lift, 6) AS poststrat_lift_r6
    FROM tot CROSS JOIN ps
    """,
)
def poststratified_lift_user_spend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Post-stratification adjusted spend lift
    (operators/experiment.post_stratified_lift): units are users,
    strata are PRE-period activity bands (first-half-of-month event
    counts: 0 / 1-2 / 3-5 / 6+), the outcome is second-half spend in
    cents, arms hash-assigned — the third variance-reduction reading
    beside CUPED's regression and the winsorized cap, catching the
    chance stratum-composition imbalance a raw diff-of-means books as
    an effect. NULL user ids are excluded up front (the srm_audit
    rationale: unidentifiable units cannot be randomized, and DuckDB's
    NULL-skipping concat would hash them to an arm the engine does
    not). One (stratum, arm) aggregate; every later step runs on
    the 4-row strata relation."""
    from pinterest_data_pipeline_spark.operators.experiment import (
        hash_assign_arm,
        post_stratified_lift,
    )

    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    units = ev.groupBy("user_id").agg(
        F.sum(F.when(F.dayofmonth("ts") <= 15, 1).otherwise(0)).alias(
            "n_pre"
        ),
        F.sum(
            F.when(
                F.dayofmonth("ts") > 15,
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        ).alias("cents"),
    )
    units = units.select(
        hash_assign_arm("user_id").alias("arm"),
        F.when(F.col("n_pre") == 0, 0)
        .when(F.col("n_pre") <= 2, 1)
        .when(F.col("n_pre") <= 5, 2)
        .otherwise(3)
        .cast("long")
        .alias("stratum"),
        "cents",
    )
    return post_stratified_lift(units, "arm", "stratum", "cents")


# ---------------------------------------------------- record survivorship
_SURV_RECORDS = """
    orig AS (
        SELECT c_custkey AS k, 1 AS rec, c_name AS name,
               c_mktsegment AS seg,
               CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        FROM customer
    ),
    twin AS (
        SELECT k, 2 AS rec,
               CASE WHEN k % 70 = 0 THEN NULL
                    WHEN k % 28 = 0 THEN name || ' JR'
                    ELSE name END AS name,
               CASE WHEN k % 35 = 0 THEN 'RE-ENTERED' ELSE seg END AS seg,
               CASE WHEN k % 21 = 0 THEN cents + 1 ELSE cents END AS cents
        FROM orig WHERE k % 7 = 0
    ),
    recs AS (
        SELECT * FROM orig UNION ALL SELECT * FROM twin
    )
"""


@_stage(
    "survivorship_golden_record",
    oracle=f"""
    WITH {_SURV_RECORDS}
    SELECT k,
           max(CASE WHEN name IS NOT NULL THEN
               {{'l': length(name), 'r': rec, 'v': name}} END).v AS name,
           max(CASE WHEN seg IS NOT NULL THEN
               {{'r': rec, 'v': seg}} END).v AS seg,
           max(cents) AS cents,
           CAST(count(*) AS BIGINT) AS n_records,
           CAST((CASE WHEN count(DISTINCT name) > 1 THEN 1 ELSE 0 END)
              + (CASE WHEN count(DISTINCT seg) > 1 THEN 1 ELSE 0 END)
              + (CASE WHEN count(DISTINCT cents) > 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_conflict_fields
    FROM recs GROUP BY k
    """,
)
def survivorship_golden_record(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Survivorship merge to golden records
    (operators/linkage.survivorship_golden_record) — the step AFTER
    fellegi_sunter_link_weights (staged r12) scores the links,
    completing the record-linkage plane: linked clusters collapse to
    one golden row by field-level rules. The scenario extends the r12
    deterministic re-entry file: every 7th customer re-enters (rec 2,
    newer), with the name MISSING on every 70th (web form skipped it
    — the longest-non-null rule recovers the original), a LONGER
    legal-suffix name on every 28th (the fuller value wins), a segment
    rewrite on every 35th (the recency rule takes the newer segment),
    and +1 cent on every 21st (max wins). n_conflict_fields makes
    every adjudication auditable — a zero means unanimous, not merged.

    Scale: ONE map-side-combinable groupBy(cluster) of max-of-struct
    aggregates — no window, no self-join, no per-field shuffle."""
    from pinterest_data_pipeline_spark.operators.linkage import (
        survivorship_golden_record as merge_golden,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.lit(1).alias("rec"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    twin = cust.where(F.col("k") % 7 == 0).select(
        "k",
        F.lit(2).alias("rec"),
        F.when(F.col("k") % 70 == 0, F.lit(None).cast("string"))
        .when(F.col("k") % 28 == 0, F.concat(F.col("name"), F.lit(" JR")))
        .otherwise(F.col("name"))
        .alias("name"),
        F.when(F.col("k") % 35 == 0, F.lit("RE-ENTERED"))
        .otherwise(F.col("seg"))
        .alias("seg"),
        F.when(F.col("k") % 21 == 0, F.col("cents") + 1)
        .otherwise(F.col("cents"))
        .alias("cents"),
    )
    recs = cust.unionByName(twin)
    return merge_golden(
        recs,
        cluster_col="k",
        recency_col="rec",
        longest_fields=["name"],
        latest_fields=["seg"],
        max_fields=["cents"],
    )


# ------------------------------------------------ Good-Turing coverage
@_stage(
    "good_turing_bigram_coverage",
    oracle=r"""
    WITH t AS (
        SELECT lang,
               regexp_split_to_array(trim(lower(text)), '\s+') AS tk
        FROM documents
    ),
    grams AS (
        SELECT lang,
               tk[CAST(g.i AS INTEGER)] || ' ' ||
               tk[CAST(g.i AS INTEGER) + 1] AS p
        FROM t, UNNEST(range(1, len(tk))) AS g(i)
        WHERE len(tk) >= 2
    ),
    counts AS (
        SELECT lang, p, CAST(count(*) AS BIGINT) AS r
        FROM grams GROUP BY 1, 2
    ),
    per AS (
        SELECT lang,
               CAST(sum(r) AS BIGINT) AS n_bigrams,
               CAST(count(*) AS BIGINT) AS vocab,
               CAST(sum(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(sum(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
               CAST(sum(CASE WHEN r = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3
        FROM counts GROUP BY 1
    )
    SELECT lang, n_bigrams, vocab, n1, n2, n3,
           round(CASE WHEN n_bigrams = 0 THEN 0.0
                 ELSE CAST(n1 AS DOUBLE) / CAST(n_bigrams AS DOUBLE) END, 6)
               AS p0_unseen_r6,
           round(CASE WHEN n1 = 0 THEN 0.0
                 ELSE CAST(2 * n2 AS DOUBLE) / CAST(n1 AS DOUBLE) END, 6)
               AS r_star_1_r6,
           round(CASE WHEN n2 = 0 THEN 0.0
                 ELSE CAST(3 * n3 AS DOUBLE) / CAST(n2 AS DOUBLE) END, 6)
               AS r_star_2_r6
    FROM per
    """,
)
def good_turing_bigram_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Good-Turing unseen-mass and discount estimates per language
    (operators/text.good_turing_coverage) over adjacent bigrams — the
    corpus-coverage reading the smoothing family lacks: P₀ = N₁/N is
    Turing's estimate of the probability mass belonging to bigrams the
    slice has NOT seen (high ⇒ the slice undersamples its domain), and
    r* = (r+1)·N_{r+1}/N_r is the Katz-backoff discount. Bigrams
    deliberately: the synthetic corpus's unigram vocabulary is closed
    (zero hapaxes at every SF), while the bigram table keeps a live
    singleton tail.

    Scale: per-row pair explosion (array zip, no join), one
    vocabulary-sized partial aggregate, one per-group fold."""
    from pinterest_data_pipeline_spark.operators.text import (
        good_turing_coverage,
    )

    docs = load_table(spark, sf_dir, "documents")
    return good_turing_coverage(docs, "lang", "text")


# ---------------------------------------------------- KMV distinct sketch
@_stage(
    "kmv_distinct_price_points",
    oracle="""
    WITH vals AS (
        SELECT DISTINCT CAST(round(value * 100) AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL
    ),
    h AS (
        SELECT CAST(concat('0x', substr(md5(concat('kmv:',
                   CAST(v AS VARCHAR))), 1, 8)) AS BIGINT) AS h
        FROM vals
    ),
    ka AS (
        SELECT CAST(max(h) AS BIGINT) AS kth_hash,
               CAST(count(*) AS BIGINT) AS n_kept
        FROM (SELECT h FROM h ORDER BY h LIMIT 64)
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM h),
    est AS (
        SELECT n_exact, n_kept, kth_hash,
               CASE WHEN n_kept < 64 THEN CAST(n_kept AS DOUBLE)
                    ELSE 63.0 * 4294967296.0
                         / (CAST(kth_hash AS DOUBLE) + 1.0) END AS e
        FROM tot CROSS JOIN ka
    )
    SELECT n_exact, n_kept, kth_hash, round(e, 6) AS kmv_est_r6,
           CAST(floor(abs(e - CAST(n_exact AS DOUBLE)) * 1000000.0
                / CAST(n_exact AS DOUBLE)) AS BIGINT) AS err_ppm,
           floor(abs(e - CAST(n_exact AS DOUBLE)) * 1000000.0
                / CAST(n_exact AS DOUBLE)) < 400000 AS within_bound
    FROM est
    """,
)
def kmv_distinct_price_points(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """K-minimum-values distinct estimate of the observed price points
    (operators/sketches.kmv_distinct, k=64) with its exact-join error
    gate — the third explicitly-constructed sketch beside count-min
    (frequency) and MinHash (similarity), covering distinct-count: the
    sketch IS a mergeable value set (union-and-trim), every number
    md5-replayable, and the one-row output carries the true distinct,
    the estimate, the error in ppm, and the ≈3σ bound verdict, so a
    regression in the estimator is a hash mismatch, not a silent
    drift.

    Scale: domain-bounded distinct → hash → one TakeOrdered-64 cut +
    one count on the same checkpointed relation; never a full sort."""
    from pinterest_data_pipeline_spark.operators.sketches import (
        kmv_distinct,
    )

    ev = load_table(spark, sf_dir, "events")
    cents = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    return kmv_distinct(cents, "cents", k=64, salt="kmv")


# --------------------------------------------------- burstiness / Fano
@_stage(
    "event_burstiness_by_type",
    oracle="""
    WITH s AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) AS slot
        FROM events
    ),
    span AS (SELECT min(slot) AS lo, max(slot) AS hi FROM s),
    c AS (
        SELECT event_type, slot, CAST(count(*) AS BIGINT) AS c
        FROM s GROUP BY 1, 2
    ),
    p AS (
        SELECT event_type,
               CAST(sum(c) AS BIGINT) AS n_events,
               CAST(sum(c * c) AS BIGINT) AS sxx,
               CAST(count(*) AS BIGINT) AS n_occupied
        FROM c GROUP BY 1
    )
    SELECT event_type, n_events, n_occupied,
           CAST(hi - lo + 1 AS BIGINT) AS n_slots,
           round(CAST(n_events AS DOUBLE)
                 / CAST(hi - lo + 1 AS DOUBLE), 6) AS mean_per_slot_r6,
           round((CAST(hi - lo + 1 AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(n_events AS DOUBLE) * CAST(n_events AS DOUBLE))
                 / (CAST(hi - lo + 1 AS DOUBLE)
                    * CAST(n_events AS DOUBLE)), 6) AS fano_r6
    FROM p CROSS JOIN span
    """,
)
def event_burstiness_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index of dispersion (Fano factor) of hourly event counts per
    type (operators/robust_stats.dispersion_index) — the burstiness
    reading beside the family's memory (autocorr), drift
    (Mann-Kendall), level-shift (CUSUM) and weekly-shape
    (dow_seasonality) statistics: D ≈ 1 is Poisson-smooth, D ≫ 1 is
    clumped into bursts, D < 1 is pacemaker-regular. The slot grid is
    the global [min, max] epoch-hour span, so hours with zero events
    count — leaving them out would bias every mean up.

    Scale: one (type, hour) map-side count, one per-type fold, one
    broadcast one-row span; no sort, no window."""
    from pinterest_data_pipeline_spark.operators.robust_stats import (
        dispersion_index,
    )

    ev = load_table(spark, sf_dir, "events")
    return dispersion_index(
        ev, "event_type", F.floor(F.unix_timestamp(F.col("ts")) / F.lit(3600))
    )


# ------------------------------------------------------------ SRM audit
@_stage(
    "srm_assignment_audit",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
    a AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN CAST(concat('0x', substr(md5(concat(
                   'exp1:', CAST(user_id AS VARCHAR))), 1, 8)) AS BIGINT)
                   % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS t1,
               CAST(sum(CASE WHEN CAST(concat('0x', substr(md5(concat(
                   'ramp2:', CAST(user_id AS VARCHAR))), 1, 8)) AS BIGINT)
                   % 4 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS t2
        FROM u
    ),
    rows_ AS (
        SELECT 'exp1' AS experiment, n AS n_units, t1 AS n_treatment,
               CAST(500000 AS BIGINT) AS expected_treatment_ppm
        FROM a
        UNION ALL
        SELECT 'ramp2', n, t2, CAST(500000 AS BIGINT) FROM a
    ),
    x AS (
        SELECT experiment, n_units, n_treatment, expected_treatment_ppm,
               (CAST(n_treatment AS DOUBLE)
                - CAST(n_units AS DOUBLE)
                  * CAST(expected_treatment_ppm AS DOUBLE) / 1000000.0)
               AS dt,
               CAST(n_units AS DOUBLE)
                 * CAST(expected_treatment_ppm AS DOUBLE) / 1000000.0
               AS et
        FROM rows_
    )
    SELECT experiment, n_units, n_treatment, expected_treatment_ppm,
           round(dt * dt / et
                 + ((CAST(n_units AS DOUBLE) - CAST(n_treatment AS DOUBLE))
                    - (CAST(n_units AS DOUBLE) - et))
                   * ((CAST(n_units AS DOUBLE) - CAST(n_treatment AS DOUBLE))
                      - (CAST(n_units AS DOUBLE) - et))
                   / (CAST(n_units AS DOUBLE) - et), 6) AS chisq_r6,
           (dt * dt / et
            + ((CAST(n_units AS DOUBLE) - CAST(n_treatment AS DOUBLE))
               - (CAST(n_units AS DOUBLE) - et))
              * ((CAST(n_units AS DOUBLE) - CAST(n_treatment AS DOUBLE))
                 - (CAST(n_units AS DOUBLE) - et))
              / (CAST(n_units AS DOUBLE) - et)) > 10.83 AS srm_flag
    FROM x
    """,
)
def srm_assignment_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch audit (operators/experiment.srm_audit) —
    the trust gate run before reading any experiment: a chi-square
    goodness-of-fit of each experiment's observed treatment share
    against its CONFIGURED split (distinct from the registered
    chi_square_independence, which tests metric ⊥ arm on a two-way
    table). Two experiments over the distinct-user population: 'exp1'
    is the standard md5 50/50 assignment audited against 50/50 (must
    pass); 'ramp2' deliberately assigns hash % 4 == 0 (a 25% ramp
    whose config was never updated from 50/50) — the classic SRM bug
    shape the flag exists to catch, firing once n is large enough for
    chi-square_1 > 10.83 (p < 0.001).

    Scale: ONE aggregate over distinct users computes every
    experiment's counts as conditional sums; per-experiment rows
    unpivot from that single driver-sized row. NULL unit ids are
    excluded up front — you cannot randomize a unit you cannot
    identify, and the engines would diverge on one anyway (DuckDB's
    concat SKIPS NULL arguments, Spark's propagates, so the md5 arm
    of a NULL id differs)."""
    from pinterest_data_pipeline_spark.operators.dedup import (
        portable_hash32,
    )
    from pinterest_data_pipeline_spark.operators.experiment import srm_audit

    ev = load_table(spark, sf_dir, "events")
    units = (
        ev.where(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
    )

    def _h(salt: str):
        return portable_hash32(
            F.concat(F.lit(f"{salt}:"), F.col("user_id").cast("string"))
        )

    return srm_audit(
        units,
        [
            ("exp1", _h("exp1") % 2 == 0, 500_000),
            ("ramp2", _h("ramp2") % 4 == 0, 500_000),
        ],
    )
