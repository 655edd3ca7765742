"""ROUND-13 STAGING SEED — implemented, tested, NOT driver-registered.

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
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.plans.registry import has_sql_line_comment
from pinterest_data_pipeline_spark.sources.parquet import load_table

STAGED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
STAGED_ORACLE: dict[str, str] = {}


def _stage(name: str, oracle: str | None = None):
    """registry.register's contract, into the round-13 staging dicts."""

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
        FROM events GROUP BY 1, 2
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
    an effect. One (stratum, arm) aggregate; every later step runs on
    the 4-row strata relation."""
    from pinterest_data_pipeline_spark.operators.experiment import (
        hash_assign_arm,
        post_stratified_lift,
    )

    ev = load_table(spark, sf_dir, "events")
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
