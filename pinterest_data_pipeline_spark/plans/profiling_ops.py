"""Data-profiling queries: equi-width histograms and per-column summary
statistics — the "what is in this table" pass that precedes any curation
or layout decision at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.plans.registry import register
from pinterest_data_pipeline_spark.sources.parquet import load_table

# Histogram bounds chosen to cover TPC-H acctbal (-999.99 .. 9999.99) with
# an exact double bucket width ((10000 - -1000) / 22 = 500.0), so the
# boundary arithmetic below is bit-identical in both engines.
_LO, _HI, _NB = -1000.0, 10000.0, 22


@register(
    "histogram_acctbal_width_bucket",
    oracle=f"""
    SELECT CAST(CASE WHEN c_acctbal < {_LO} THEN 0
                WHEN c_acctbal >= {_HI} THEN {_NB} + 1
                ELSE 1 + CAST(floor((c_acctbal - {_LO})
                              / (({_HI} - {_LO}) / {_NB})) AS BIGINT)
           END AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS cents_total
    FROM customer GROUP BY 1 ORDER BY bucket
    """,
)
def histogram_acctbal_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of customer balances through the built-in
    ``width_bucket`` (underflow → 0, overflow → n+1, in-range →
    ``1 + floor((v - lo) / bucket_width)``). DuckDB has no width_bucket,
    so the oracle states that arithmetic explicitly — which is exactly
    the cross-engine pin: the histogram only matches if Spark's function
    implements the documented boundary semantics.

    Scale: a histogram is the textbook map-side-combinable aggregation —
    partial buckets per partition, one metadata-sized exchange of ≤ nb+2
    rows per partition. Per-bucket money totals are integer cents.
    """
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy(
            F.width_bucket(
                F.col("c_acctbal"), F.lit(_LO), F.lit(_HI), F.lit(_NB)
            )
            .cast("bigint")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(
                F.round(F.col("c_acctbal") * 100).cast("bigint")
            ).alias("cents_total"),
        )
        .orderBy("bucket")
    )


_PROFILE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _profile_oracle() -> str:
    parts = [
        f"""
        SELECT '{c}' AS col_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT({c}) AS BIGINT) AS n_nonnull,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_str,
               CAST(MAX({c}) AS VARCHAR) AS max_str
        FROM documents
        """
        for c in _PROFILE_COLS
    ]
    return " UNION ALL ".join(parts)


@register("profile_documents_columns", oracle=_profile_oracle())
def profile_documents_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of the documents table: row/non-null/distinct
    counts plus min/max rendered as strings — the schema-independent
    summary shape (one output row per column) a curation pipeline logs
    before and after every stage.

    Scale: ONE scan, not one per column. All per-column aggregates run in
    a single ``agg`` (the multi-count-distinct is planned via Expand —
    a constant-factor row multiply — rather than N passes over the
    table), then the wide 1-row result is unpivoted driver-side into the
    per-column layout with ``stack``, which is metadata work.
    """
    doc = load_table(spark, sf_dir, "documents")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nn"),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = doc.agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, {c}__min, {c}__max" for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(col_name, n_nonnull, n_distinct, min_str, max_str)",
        "n_rows",
    ).select("col_name", "n_rows", "n_nonnull", "n_distinct", "min_str", "max_str")


@register(
    "equidepth_histogram_acctbal",
    oracle="""
    WITH cuts AS (
        SELECT quantile_cont(c_acctbal,
                   [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS q
        FROM customer
    )
    SELECT CAST(len(list_filter(q, c -> c_acctbal >= c)) AS INTEGER)
               AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           MIN(CAST(round(c_acctbal * 100) AS BIGINT)) AS lo_cents,
           MAX(CAST(round(c_acctbal * 100) AS BIGINT)) AS hi_cents
    FROM customer, cuts
    GROUP BY 1 ORDER BY bucket
    """,
)
def equidepth_histogram_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (decile buckets): exact interpolated decile
    cutpoints via one ``percentile`` aggregate, broadcast to the scan,
    and each row's bucket = how many cutpoints it is ≥ — a higher-order
    ``filter``+``size`` over the 9-element array, zero per-row joins.

    This is the quantile machinery behind range partitioning and sorted
    layouts (`repartitionByRange` samples; this computes exact bounds).
    The global ntile() alternative is a single-partition window over the
    whole table — the canonical scale-killer this formulation avoids:
    here the only full-data exchange is the percentile aggregate's
    partial/final pair, and bucketing is scan-side codegen.

    Both engines use the same (n-1)·q linear interpolation for
    ``percentile``/``quantile_cont``, so cutpoints and therefore bucket
    boundaries agree bit-for-bit (pinned already by `agg_percentiles`).
    """
    cust = load_table(spark, sf_dir, "customer")
    cuts = cust.agg(
        F.percentile(
            "c_acctbal",
            F.array(*[F.lit(q / 10.0) for q in range(1, 10)]),
        ).alias("q")
    )
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    return (
        cust.join(F.broadcast(cuts))
        .groupBy(
            F.size(
                F.filter(F.col("q"), lambda c: F.col("c_acctbal") >= c)
            ).alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min(cents).alias("lo_cents"),
            F.max(cents).alias("hi_cents"),
        )
        .orderBy("bucket")
    )


@register(
    "key_skew_profile_events",
    oracle="""
    WITH per_key AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events
        GROUP BY user_id
    ), ranked AS (
        SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS r
        FROM per_key
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           MAX(n) AS max_key_rows,
           CAST((1000000 * MAX(n) * COUNT(*)) // SUM(n) AS BIGINT)
               AS skew_ppm,
           CAST(SUM(n) FILTER (WHERE r <= 10) AS BIGINT) AS top10_rows
    FROM ranked
    """,
)
def key_skew_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg key-skew profile for ``events.user_id``: key count, max
    per-key rows, the hottest key's load as ppm of a perfectly uniform
    share (1,000,000 = uniform; 30,000,000 = one key carries 30× its
    share), and the top-10 keys' combined rows. This is the measurement
    you run BEFORE choosing salting / AQE-skew-join / broadcast for a
    100 TB join — operators/skew.py is the cure, this is the diagnosis.

    Scale: one partial-combinable count per key, then every further stat
    runs over the |keys|-sized aggregate. The top-10 load is a
    TakeOrdered cut (per-partition top-10 + driver merge), NOT a global
    ranking window — |distinct keys| can be ~1e9 at 100 TB, and a
    row_number over that relation is one fat sort task (the round-5
    rewrite removed exactly that window). The skew ratio is integer ppm
    (floor div of exact counts), hash-exact cross-engine.
    """
    ev = load_table(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    stats = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_key_rows"),
        F.expr("(1000000 * max(n) * count(*)) div sum(n)").alias("skew_ppm"),
    )
    top10 = (
        per_key.orderBy(F.desc("n"), F.asc("user_id"))
        .limit(10)
        .agg(F.sum("n").alias("top10_rows"))
    )
    return stats.crossJoin(F.broadcast(top10)).select(
        "n_keys", "n_rows", "max_key_rows", "skew_ppm", "top10_rows"
    )


@register(
    "fk_integrity_audit",
    oracle="""
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
       WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
          AS orphan_lineitems,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
       WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
          AS orphan_orders,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                         WHERE l.l_orderkey = o.o_orderkey))
          AS childless_orders
    """,
)
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: orphaned fact
    rows (lineitem keys with no order, orders with no customer) and
    childless parents (orders with no line items) — the checks a
    pipeline runs after every ingest, since a broken FK silently turns
    inner joins into row loss.

    An orphan is an IDENTIFIABLE key whose parent is missing: NULL FKs
    are excluded on both sides (the SQL MATCH SIMPLE convention, and
    what the oracle's NOT IN computes anyway — NULL NOT IN is never
    true). A NULL FK is a completeness defect, not a dangling
    reference; the column-profile queries count those.

    Scale: each check is an anti-join (LeftAnti hash join — NOT IN's
    naive form would be a per-row subquery), counted map-side. The three
    counts cross-join into one row — each side is a single scalar.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    orphan_li = (
        li.where(F.col("l_orderkey").isNotNull())
        .join(orders, li["l_orderkey"] == orders["o_orderkey"], "anti")
        .agg(F.count(F.lit(1)).alias("orphan_lineitems"))
    )
    orphan_o = (
        orders.where(F.col("o_custkey").isNotNull())
        .join(cust, orders["o_custkey"] == cust["c_custkey"], "anti")
        .agg(F.count(F.lit(1)).alias("orphan_orders"))
    )
    childless = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"], "anti")
        .agg(F.count(F.lit(1)).alias("childless_orders"))
    )
    return orphan_li.crossJoin(orphan_o).crossJoin(childless)


@register(
    "per_source_lang_mix",
    oracle="""
    WITH counts AS (
        SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2
    ), ranked AS (
        SELECT source, lang, n,
               SUM(n) OVER (PARTITION BY source) AS total,
               COUNT(*) OVER (PARTITION BY source) AS nl,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n DESC, lang) AS rn
        FROM counts
    )
    SELECT source,
           CAST(total AS BIGINT) AS n_docs,
           CAST(nl AS BIGINT) AS n_langs,
           lang AS top_lang,
           CAST((n * 1000000) // total AS BIGINT) AS top_lang_ppm
    FROM ranked WHERE rn = 1
    """,
)
def per_source_lang_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source language-mix dashboard: document count, distinct
    languages, dominant language and its share (integer ppm) — the
    per-domain composition report a multilingual corpus build reviews
    before setting mixture weights (`mixture_upsample_by_lang` is the
    actuator; this is the report).

    All-integer outputs (floor-div ppm) so the hash compare never sees
    a ratio double. n_langs is a window COUNT over the (source, lang)
    relation on BOTH sides — a correlated equality subquery would drop
    the NULL-source group the window keeps. Scale: one (source, lang)
    aggregate — the ranking window and share arithmetic run over that
    metadata-sized table.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source")
    ranked = counts.select(
        "source",
        "lang",
        "n",
        F.sum("n").over(w).alias("total"),
        F.count(F.lit(1)).over(w).alias("n_langs"),
        F.row_number()
        .over(Window.partitionBy("source").orderBy(F.desc("n"), F.asc("lang")))
        .alias("rn"),
    )
    return ranked.where(F.col("rn") == 1).select(
        "source",
        F.col("total").alias("n_docs"),
        F.col("n_langs"),
        F.col("lang").alias("top_lang"),
        F.expr("(n * 1000000) div total").alias("top_lang_ppm"),
    )


@register(
    "first_digit_profile",
    oracle="""
    SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                            AS VARCHAR), 1, 1) AS INTEGER) AS first_digit,
           CAST(COUNT(*) AS BIGINT) AS n,
           (CAST(COUNT(*) AS BIGINT) * 1000000)
               // (SELECT COUNT(*) FROM orders) AS share_ppm
    FROM orders GROUP BY 1 ORDER BY first_digit
    """,
)
def first_digit_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit profile of order totals — the data-forensics
    screen for fabricated or truncated monetary data (natural
    multi-magnitude amounts follow log-decaying digit frequencies; flat
    or spiked profiles flag synthetic injection or unit bugs upstream).
    Digits come from the integer-cents rendering; shares are integer
    ppm, normalized by a window over the ≤9-row aggregate (no second
    scan, no driver-side count). One map-side-combinable aggregate.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents_str = F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string")
    return (
        orders.groupBy(
            F.substring(cents_str, 1, 1).cast("int").alias("first_digit")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "first_digit",
            "n",
            F.expr("(n * 1000000) div sum(n) over ()").alias("share_ppm"),
        )
        .orderBy("first_digit")
    )


# ----------------------------------------------- statistical dependence


@register(
    "corr_cov_value_hour",
    oracle="""
    WITH t AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS cents,
               CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr
        FROM events
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(cents) AS sx, SUM(hr) AS sy,
               SUM(cents * cents) AS sxx, SUM(hr * hr) AS syy,
               SUM(cents * hr) AS sxy
        FROM t
    )
    SELECT n,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(n AS DOUBLE) * sxx
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n AS DOUBLE) * syy
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
               AS corr_cents_hour,
           round((CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                 / (n - 1), 6) AS covar_cents_hour
    FROM s
    """,
)
def corr_cov_value_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + sample covariance between event value and
    hour-of-day — the 'is this metric seasonal?' profile. Computed from
    EXACT integer aggregate sums (cents, hour) with the closed-form
    identities, like ols_price_vs_quantity: the one-pass sums are
    bit-exact and order-independent, and only the final handful of
    double ops runs per engine — the float-parity recipe for
    distributed statistics (df.stat.corr's streaming co-moment would
    differ between engines in low bits)."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        F.hour("ts").cast("bigint").alias("hr"),
    )
    s = t.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").alias("sx"),
        F.sum("hr").alias("sy"),
        F.sum(F.col("cents") * F.col("cents")).alias("sxx"),
        F.sum(F.col("hr") * F.col("hr")).alias("syy"),
        F.sum(F.col("cents") * F.col("hr")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    return s.select(
        "n",
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        ).alias("corr_cents_hour"),
        F.round((sxy - sx * sy / F.col("n")) / (F.col("n") - 1), 6).alias(
            "covar_cents_hour"
        ),
    )


@register(
    "crosstab_type_value_band",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) FILTER (WHERE CAST(floor(value / 25.0) AS BIGINT) <= 0)
               AS BIGINT) AS band_0,
           CAST(COUNT(*) FILTER (WHERE CAST(floor(value / 25.0) AS BIGINT) = 1)
               AS BIGINT) AS band_1,
           CAST(COUNT(*) FILTER (WHERE CAST(floor(value / 25.0) AS BIGINT) = 2)
               AS BIGINT) AS band_2,
           CAST(COUNT(*) FILTER (WHERE CAST(floor(value / 25.0) AS BIGINT) >= 3)
               AS BIGINT) AS band_3
    FROM events GROUP BY event_type
    """,
)
def crosstab_type_value_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table event_type × value band (the df.stat.crosstab
    shape with a FIXED band dimension, so the output schema is stable —
    raw crosstab's data-dependent columns can't be schema-checked).
    One groupBy with conditional counts: a single shuffle on the row
    dimension regardless of band count."""
    ev = load_table(spark, sf_dir, "events")
    band = F.floor(F.col("value") / F.lit(25.0))

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    return ev.groupBy("event_type").agg(
        cnt(band <= 0).alias("band_0"),
        cnt(band == 1).alias("band_1"),
        cnt(band == 2).alias("band_2"),
        cnt(band >= 3).alias("band_3"),
    )
