"""Generic relational operator matrix over the driver testdata.

One oracle-checked query per operator family from SURVEY.md §2 (scans,
projections, filters, scalar functions, joins of every type, aggregations,
sorts/limits, windows, set ops, distinct, pivot/unpivot, JSON, arrays,
sessionization). Together with the canonical shapes in analog_queries.py
this is the engine's declared coverage surface.

Cross-engine determinism rules used throughout (so value-hashes match the
DuckDB oracle):
- Sums of doubles go through DECIMAL (exact) and are cast back to double —
  double summation order varies with partitioning, decimal doesn't.
- Every window ORDER BY ends in a unique key so ranks are total.
- DuckDB ``regexp_replace`` needs the ``'g'`` flag to match Spark's
  replace-all; ``||`` (not ``concat``) matches Spark's NULL propagation;
  ``year()``/count outputs are cast to Spark's narrower result types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.plans.registry import register
from pinterest_data_pipeline_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# Scans / projections / column ops (SURVEY §2.1, §2.2)
# ---------------------------------------------------------------------------


@register(
    "project_rename_drop",
    oracle="""
    SELECT l_orderkey AS orderkey, l_linenumber AS lineno, l_quantity AS qty
    FROM lineitem
    """,
)
def project_rename_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2/P3: project + reorder + rename + drop (README.md:400,412,509).
    The pruned 3-column ReadSchema is visible in the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity", "l_tax")
        .withColumnRenamed("l_orderkey", "orderkey")
        .withColumnRenamed("l_linenumber", "lineno")
        .withColumnRenamed("l_quantity", "qty")
        .drop("l_tax")
    )


@register(
    "filter_pushdown_scan",
    oracle="""
    SELECT l_orderkey AS orderkey, l_extendedprice AS price,
           l_quantity AS qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_quantity > 45.0 AND l_returnflag = 'R'
    """,
)
def filter_pushdown_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row filters (absent in the reference — SURVEY §2.2 note — but part
    of the engine surface). Conjunctive predicates reach the parquet scan
    as PushedFilters; only 5 of 11 columns are read."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_quantity") > 45.0)
        & (F.col("l_returnflag") == "R")
    ).select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").alias("qty"),
    )


@register(
    "null_standardize_replace",
    oracle="""
    SELECT CASE WHEN event_type = 'error' THEN NULL ELSE event_type END
               AS event_type,
           COUNT(*) AS n
    FROM events GROUP BY 1
    """,
)
def null_standardize_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: na.replace sentinel→NULL (README.md:371), grouped to show the
    NULL key flows through aggregation like any other group."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.na.replace({"error": None}, subset=["event_type"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# Scalar functions (SURVEY §2.3)
# ---------------------------------------------------------------------------


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey AS partkey,
           upper(p_type) AS type_upper,
           lower(p_brand) AS brand_lower,
           split_part(p_name, ' ', 1) AS first_token,
           p_brand || '-' || p_type AS brand_type,
           regexp_replace(p_brand, '[0-9]+', '#', 'g') AS brand_masked,
           CAST(length(p_name) AS INTEGER) AS name_len,
           substring(p_name, 1, 3) AS name_prefix
    FROM part
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F3/F6-style string surface: regexp_replace, split+get, concat,
    upper/lower/length/substring (README.md:379-392, 432)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        F.col("p_partkey").alias("partkey"),
        F.upper("p_type").alias("type_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.get(F.split("p_name", " "), 0).alias("first_token"),
        F.concat("p_brand", F.lit("-"), "p_type").alias("brand_type"),
        F.regexp_replace("p_brand", "[0-9]+", "#").alias("brand_masked"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 3).alias("name_prefix"),
    )


@register(
    "scalar_datetime_funcs",
    oracle="""
    SELECT o_orderkey AS orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           CAST(day(o_orderdate) AS INTEGER) AS order_day,
           date_trunc('month', o_orderdate) AS month_start,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS formatted
    FROM orders
    """,
)
def scalar_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/F7/F8: timestamp parts, truncation, formatting
    (README.md:420,440,481; producer strftime at
    user_posting_emulation.py:63-64)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey").alias("orderkey"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("formatted"),
    )


@register(
    "conditional_null_funcs",
    oracle="""
    SELECT c_custkey AS custkey,
           CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                WHEN c_acctbal < 5000 THEN 'standard'
                ELSE 'premium' END AS tier,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'NONE') AS segment_or_none,
           least(c_acctbal, 1000.0) AS capped_low,
           greatest(c_acctbal, 0.0) AS capped_high,
           (c_acctbal IS NULL) AS bal_is_null
    FROM customer
    """,
)
def conditional_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN chains (the age_range pattern, README.md:553-560) plus
    coalesce/nullif/least/greatest/isnull."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        F.col("c_custkey").alias("custkey"),
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("NONE")).alias(
            "segment_or_none"
        ),
        F.least("c_acctbal", F.lit(1000.0)).alias("capped_low"),
        F.greatest("c_acctbal", F.lit(0.0)).alias("capped_high"),
        F.isnull("c_acctbal").alias("bal_is_null"),
    )


@register(
    "cast_funcs",
    oracle="""
    SELECT s_suppkey AS suppkey,
           CAST(floor(s_acctbal) AS INTEGER) AS bal_floor_int,
           CAST(s_suppkey AS VARCHAR) AS key_str,
           TRY_CAST(s_name AS INTEGER) AS name_as_int,
           CAST(s_nationkey AS BIGINT) AS nationkey_long,
           CAST(s_suppkey AS DOUBLE) AS key_double
    FROM supplier
    """,
)
def cast_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/F5 cast surface incl. NULL-on-failure try_cast (the reference
    relies on non-ANSI cast-to-NULL, README.md:383; we use try_cast).
    floor() before int conversion because Spark truncates double→int while
    DuckDB rounds — floor makes both exact."""
    sup = load_table(spark, sf_dir, "supplier")
    return sup.select(
        F.col("s_suppkey").alias("suppkey"),
        F.floor("s_acctbal").cast("int").alias("bal_floor_int"),
        F.col("s_suppkey").cast("string").alias("key_str"),
        F.col("s_name").try_cast("int").alias("name_as_int"),
        F.col("s_nationkey").cast("bigint").alias("nationkey_long"),
        F.col("s_suppkey").cast("double").alias("key_double"),
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.4 + engine extensions: outer/semi/anti/cross)
# ---------------------------------------------------------------------------


@register(
    "join_inner_large",
    oracle="""
    SELECT l_orderkey AS orderkey, l_linenumber AS lineno,
           o_orderstatus AS status, l_extendedprice AS price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_totalprice > 150000.0
    """,
)
def join_inner_large(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: fact-to-fact inner equi-join. At 100 TB this is the sort-merge
    path — both sides shuffle on the key unless bucketed; the filter on
    orders is pushed below the join by Catalyst."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 150000.0
    )
    return li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "inner").select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("lineno"),
        F.col("o_orderstatus").alias("status"),
        F.col("l_extendedprice").alias("price"),
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT o_orderkey AS orderkey, c.c_name AS customer
    FROM orders o
    LEFT JOIN (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING') c
      ON o.o_custkey = c.c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: unmatched orders keep NULL customer."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    return orders.join(cust, orders["o_custkey"] == cust["c_custkey"], "left").select(
        F.col("o_orderkey").alias("orderkey"), F.col("c_name").alias("customer")
    )


@register(
    "join_full_outer",
    oracle="""
    SELECT n_nationkey AS nationkey, n_name AS nation,
           s_suppkey AS suppkey, s_name AS supplier
    FROM supplier FULL OUTER JOIN nation ON s_nationkey = n_nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: nations without suppliers and (if any) suppliers
    without nations both survive with NULLs."""
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return sup.join(nation, sup["s_nationkey"] == nation["n_nationkey"], "full").select(
        F.col("n_nationkey").alias("nationkey"),
        F.col("n_name").alias("nation"),
        F.col("s_suppkey").alias("suppkey"),
        F.col("s_name").alias("supplier"),
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS customer FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join: customers having at least one big order; the right
    side is only probed, never duplicated into the output."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000.0
    )
    return cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "semi").select(
        F.col("c_custkey").alias("custkey"), F.col("c_name").alias("customer")
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS customer FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join: customers with no orders at all."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "anti").select(
        F.col("c_custkey").alias("custkey"), F.col("c_name").alias("customer")
    )


@register(
    "join_cross",
    oracle="""
    SELECT r_name AS region, seg.segment AS segment
    FROM region, (SELECT DISTINCT c_mktsegment AS segment FROM customer) seg
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two tiny inputs (|regions| × |segments|)."""
    region = load_table(spark, sf_dir, "region")
    segs = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("segment"))
        .distinct()
    )
    return region.crossJoin(segs).select(F.col("r_name").alias("region"), "segment")


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.5 + extensions)
# ---------------------------------------------------------------------------

# Decimal-first summation: exact regardless of partitioning, then a single
# deterministic decimal→double cast for output parity with the oracle.
_DEC = "decimal(18,2)"


@register(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (1 - CAST(l_discount AS DECIMAL(12,2))) *
                    (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
           CAST(COUNT(*) AS BIGINT) AS count_order,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY 1, 2
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/A4-style multi-aggregate (TPC-H Q1 shape): sums via DECIMAL so
    the result is independent of partition-level summation order, plus
    min/max/count. Partial (map-side) aggregation applies — at 100 TB the
    shuffle carries |groups| rows per partition, not data."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    qty_d = F.col("l_quantity").cast(_DEC)
    price_d = F.col("l_extendedprice").cast(_DEC)
    disc_d = F.col("l_discount").cast(_DEC)
    price_s = F.col("l_extendedprice").cast("decimal(12,2)")
    disc_s = F.col("l_discount").cast("decimal(12,2)")
    tax_s = F.col("l_tax").cast("decimal(12,2)")
    return (
        li.groupBy(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
        )
        .agg(
            F.sum(qty_d).cast("double").alias("sum_qty"),
            F.sum(price_d).cast("double").alias("sum_base_price"),
            F.sum(price_d * (F.lit(1) - disc_d)).cast("double").alias("sum_disc_price"),
            F.sum(price_s * (F.lit(1) - disc_s) * (F.lit(1) + tax_s))
            .cast("double")
            .alias("sum_charge"),
            F.count("*").alias("count_order"),
            F.min("l_quantity").cast("double").alias("min_qty"),
            F.max("l_extendedprice").cast("double").alias("max_price"),
        )
    )


@register(
    "agg_distinct_counts",
    oracle="""
    SELECT CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    """,
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global grand aggregate (A4) with exact distinct counts. At scale,
    multiple count-distincts expand into an expand+two-phase agg; prefer
    approx_count_distinct (see approx_distinct_events) when 2% error is
    acceptable."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count_distinct("l_suppkey").alias("n_suppliers"),
        F.count_distinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_rows"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals; NULL subtotal keys standardized to 'ALL'
    (keys are known non-NULL in the data so the coalesce is unambiguous)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
        )
    )


@register(
    "agg_cube",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 2^k grouping combinations."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
        )
    )


@register(
    "agg_grouping_sets_sql",
    oracle="""
    SELECT coalesce(c_mktsegment, 'ALL') AS segment,
           coalesce(CAST(c_nationkey AS VARCHAR), 'ALL') AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
    """,
)
def agg_grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the engine's SQL interface (the reference
    has no SQL surface — SURVEY §2.12 — ours does)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("rel_gs_customer")
    return spark.sql(
        """
        SELECT coalesce(c_mktsegment, 'ALL') AS segment,
               coalesce(CAST(c_nationkey AS STRING), 'ALL') AS nationkey,
               COUNT(*) AS n
        FROM rel_gs_customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        """
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k (SURVEY §2.6)
# ---------------------------------------------------------------------------


@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey AS orderkey, o_totalprice AS totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+limit: global top-k. Spark plans TakeOrderedAndProject — per-
    partition heaps + driver merge, no global sort even at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
        )
    )


@register(
    "limit_offset_sample",
    oracle="""
    SELECT o_orderkey AS orderkey, o_orderstatus AS status
    FROM orders ORDER BY o_orderkey LIMIT 5 OFFSET 100
    """,
)
def limit_offset_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/O3: the producers' LIMIT-offset row sampler
    (user_posting_emulation.py:41-57) as a deterministic offset+limit."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy("o_orderkey")
        .offset(100)
        .limit(5)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderstatus").alias("status"),
        )
    )


# ---------------------------------------------------------------------------
# Window functions (SURVEY §2.7)
# ---------------------------------------------------------------------------


@register(
    "window_rank_top3",
    oracle="""
    WITH ranked AS (
        SELECT c_nationkey AS nationkey, c_custkey AS custkey,
               c_acctbal AS acctbal,
               ROW_NUMBER() OVER w AS rn,
               RANK() OVER w AS rnk,
               DENSE_RANK() OVER w AS drnk
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey
                     ORDER BY c_acctbal DESC, c_custkey ASC)
    )
    SELECT nationkey, custkey, acctbal,
           CAST(rn AS INTEGER) AS rn, CAST(rnk AS INTEGER) AS rnk,
           CAST(drnk AS INTEGER) AS drnk
    FROM ranked WHERE rn <= 3
    """,
)
def window_rank_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window trio over a total order (unique-key tie-break)."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_custkey").alias("custkey"),
            F.col("c_acctbal").alias("acctbal"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_and_lag",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate NULLS FIRST, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend,
           lag(o_orderkey) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate NULLS FIRST, o_orderkey) AS prev_order,
           lead(o_orderkey) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate NULLS FIRST, o_orderkey) AS next_order
    FROM orders
    """,
)
def window_running_and_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum (decimal-exact) + lag/lead over an explicit ROWS frame.
    NULL order dates sort FIRST, pinned explicitly on both sides (the
    Spark ASC default; ANSI engines default NULLS LAST)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc_nulls_first(), "o_orderkey"
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.sum(F.col("o_totalprice").cast(_DEC)).over(wsum).cast("double").alias(
            "running_spend"
        ),
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
    )


# ---------------------------------------------------------------------------
# Set operations / distinct (SURVEY §2.8, §2.12)
# ---------------------------------------------------------------------------


@register(
    "set_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS src FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS src FROM supplier
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("src")
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("src")
    )
    return cust.unionAll(sup)


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersect(sup)


@register(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.subtract(sup)  # EXCEPT (distinct) semantics


@register(
    "distinct_pairs",
    oracle="""
    SELECT DISTINCT l_returnflag AS returnflag, l_linestatus AS linestatus
    FROM lineitem
    """,
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_linestatus").alias("linestatus"),
    ).distinct()


# ---------------------------------------------------------------------------
# Pivot / unpivot
# ---------------------------------------------------------------------------


@register(
    "pivot_status_counts",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS F,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS O,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS P
    FROM orders GROUP BY 1
    """,
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (no extra distinct-values job —
    always pin the list at scale)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))  # count("*") is invalid inside pivot in Spark 4
        .na.fill(0, ["F", "O", "P"])
    )


@register(
    "unpivot_part_attrs",
    oracle="""
    SELECT p_partkey AS partkey, 'size' AS attr,
           CAST(p_size AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'retailprice', p_retailprice FROM part
    """,
)
def unpivot_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) wide attributes to long form."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        F.col("p_partkey").alias("partkey"),
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    ).unpivot("partkey", ["size", "retailprice"], "attr", "val")


# ---------------------------------------------------------------------------
# JSON + sessionization over the events stream table
# ---------------------------------------------------------------------------


@register(
    "json_extract_events",
    # nullif: DuckDB's json_extract THROWS on an empty-string payload
    # where Spark's get_json_object returns NULL — '' is quarantined to
    # NULL so both sides read a missing payload as a missing field
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(nullif(props, ''), '$.k')
                         AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the props payload (the reference handles
    JSON only at load time — SURVEY §2.12; the engine exposes it as a
    column function). Empty-string payloads extract NULL, same as NULL
    payloads (get_json_object's behavior; the oracle nullifs to match)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count("*").alias("n"))
    )


@register(
    "sessionize_events",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_ts
        FROM events WHERE ts IS NOT NULL
    ),
    flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN prev_ts IS NULL
                         OR date_diff('second', prev_ts, ts) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM ordered
    ),
    numbered AS (
        SELECT user_id, event_id,
               SUM(new_session) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_seq
        FROM flagged
    )
    SELECT user_id, CAST(MAX(session_seq) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM numbered GROUP BY 1
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag-gap flag + running sum = session ids, 30-min
    gap. One shuffle on user_id shared by both windows and the final agg.
    NULL-ts events are dropped first: an event with no timestamp has
    no place in a gap-based session (Spark/ANSI NULL ordering would
    otherwise splice it in engine-dependently)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts").cast("long") - F.lag("ts").over(w).cast("long") > 1800),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn("session_seq", F.sum("new_session").over(wrun))
    return numbered.groupBy("user_id").agg(
        F.max("session_seq").alias("n_sessions"), F.count("*").alias("n_events")
    )


# ---------------------------------------------------------------------------
# Arrays (F4 surface) + serialization (F9)
# ---------------------------------------------------------------------------


@register(
    "array_funcs_embeddings",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           embedding[1] AS first_val,
           embedding[64] AS last_val,
           label
    FROM embeddings
    """,
)
def array_funcs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array column surface: size + element access (F4, README.md:412).
    Values are stored floats passed through untouched, so they hash equal
    across engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.get("embedding", 0).alias("first_val"),
        F.get("embedding", 63).alias("last_val"),
        "label",
    )


@register(
    "to_json_envelope",
    oracle="""
    SELECT o_orderkey AS orderkey,
           CASE WHEN o_orderstatus IS NULL
                THEN '{"orderkey":' || CAST(o_orderkey AS VARCHAR) || '}'
                ELSE '{"orderkey":' || CAST(o_orderkey AS VARCHAR) ||
                     ',"status":"' || o_orderstatus || '"}' END AS payload
    FROM orders
    """,
)
def to_json_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: the producers' JSON record envelope
    (user_posting_emulation.py:67-90) as to_json(struct(...)); oracle
    reconstructs Spark's exact serialization — including the NULL-field
    rule (to_json OMITS a NULL struct field rather than emitting
    "status":null, so the oracle's CASE drops it the same way)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey").alias("orderkey"),
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("orderkey"),
                F.col("o_orderstatus").alias("status"),
            )
        ).alias("payload"),
    )


# ---------------------------------------------------------------------------
# Approximate aggregates (extension; no SQL oracle — rows-only check)
# ---------------------------------------------------------------------------


@register(
    "approx_distinct_events",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact,
           true AS hll_rsd02_within_4sigma,
           true AS hll_rsd05_within_4sigma
    FROM events GROUP BY 1
    """,
)
def approx_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct (SURVEY §2.12 extension). At 100 TB this
    replaces exact count-distinct's expand+shuffle with a fixed-size sketch
    merged map-side.

    GATE-ORACLE FORM (round-6 upgrade from rows-only, the pattern that
    upgraded the IVF pair in round 5): the raw sketch estimate is
    engine-specific and not value-replayable, so the registered output
    carries the deterministic companions instead — exact per-group
    distincts plus a 4-sigma accuracy verdict for the sketch at TWO rsd
    settings (0.02 and 0.05; |approx − exact| ≤ 4·rsd·exact). The
    oracle pins the exact counts and `true`/`true`, so any sketch
    excursion past its advertised error is a hard hash failure rather
    than a silent rows-only pass. The exact distinct exists ONLY to
    judge the sketch — production callers run the sketch alone."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", 0.02).alias("__a02"),
        F.approx_count_distinct("user_id", 0.05).alias("__a05"),
    )

    def within(col: str, rsd: float):
        return F.abs(F.col(col) - F.col("n_users_exact")) <= F.lit(
            4 * rsd
        ) * F.col("n_users_exact")

    return agg.select(
        "event_type",
        "n",
        "n_users_exact",
        within("__a02", 0.02).alias("hll_rsd02_within_4sigma"),
        within("__a05", 0.05).alias("hll_rsd05_within_4sigma"),
    )


@register(
    "approx_distinct_error_bound",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact,
           true AS hll_within_bound
    FROM events GROUP BY 1
    """,
)
def approx_distinct_error_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy gate for the HLL++ sketch: computes approx (rsd=0.02) AND
    exact distinct per group in-engine and emits whether the sketch landed
    within 4 sigma (|approx-exact| <= 4*0.02*exact). The oracle pins the
    exact counts and `true` — any sketch excursion past the bound becomes
    a hard value-hash failure instead of a silent rows-only pass."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("n_users_exact"),
        )
        .select(
            "event_type",
            "n_users_exact",
            (
                F.abs(F.col("approx_users") - F.col("n_users_exact"))
                <= 4 * 0.02 * F.col("n_users_exact")
            ).alias("hll_within_bound"),
        )
    )


@register(
    "approx_percentile_error_bound",
    oracle="""
    SELECT l_returnflag AS returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           true AS p90_within_bound
    FROM lineitem GROUP BY 1
    """,
)
def approx_percentile_error_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy gate for the percentile sketch: the approx p90 of
    l_extendedprice (accuracy=10000 => rank error <= 1e-4) must sit at an
    exact empirical rank within 0.9 +/- (0.002 + 1/n). The rank check is
    pure integer counting (count of rows <= sketch value / group count),
    so the boolean is deterministic across engines and partition orders."""
    li = load_table(spark, sf_dir, "lineitem")
    approx = li.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.approx_percentile("l_extendedprice", 0.9, 10000).alias("p90_approx"),
    )
    return (
        li.select(F.col("l_returnflag").alias("returnflag"), "l_extendedprice")
        .join(F.broadcast(approx), "returnflag")
        .groupBy("returnflag")
        .agg(
            F.count("*").alias("n"),
            F.count(
                F.when(F.col("l_extendedprice") <= F.col("p90_approx"), True)
            ).alias("n_le"),
        )
        .select(
            "returnflag",
            "n",
            (
                F.abs(F.col("n_le") / F.col("n") - F.lit(0.9))
                <= F.lit(0.002) + F.lit(1.0) / F.col("n")
            ).alias("p90_within_bound"),
        )
    )


@register(
    "heavy_hitters_error_bound",
    oracle="""
    WITH tot AS (SELECT COUNT(*) AS n_total FROM events),
         ex AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact
                FROM events GROUP BY 1)
    SELECT event_type, n_exact, true AS in_sketch
    FROM ex, tot WHERE n_exact > 0.1 * n_total
    """,
)
def heavy_hitters_error_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy gate for the frequent-items sketch (``df.stat.freqItems``,
    a single-pass bounded-memory Karp/Shenker/Papadimitriou summary): every
    EXACT heavy hitter (frequency > 10% of the stream) must appear in the
    sketch output — the algorithm's no-false-negative guarantee. The exact
    side drives the rows (deterministic), the sketch only feeds the
    ``in_sketch`` boolean, so a sketch miss flips a value the driver
    hash-compares instead of passing silently.

    Scale notes: the sketch is one map-side pass with an O(1/support)
    state per partition and a tiny merge — no shuffle of the data; the
    exact twin is a partial-agg count plus a broadcast of the one-row
    total. At 100 TB the sketch alone is the operator; the exact twin
    exists only as this gate's oracle anchor."""
    ev = load_table(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(F.count("*").alias("n_exact"))
    total = ev.agg(F.count("*").alias("n_total"))
    sketch = ev.stat.freqItems(["event_type"], 0.1)  # 1 row: array column
    return (
        exact.join(F.broadcast(total))
        .where(F.col("n_exact") > 0.1 * F.col("n_total"))
        .join(F.broadcast(sketch))
        .select(
            "event_type",
            "n_exact",
            F.array_contains(
                F.col("event_type_freqItems"), F.col("event_type")
            ).alias("in_sketch"),
        )
    )


@register(
    "zorder_cluster_histogram",
    oracle="""
    WITH b AS (
        SELECT min(c_custkey) AS klo, max(c_custkey) AS khi,
               min(CAST(round(c_acctbal * 100) AS BIGINT)) AS alo,
               max(CAST(round(c_acctbal * 100) AS BIGINT)) AS ahi
        FROM customer
    ), t AS (
        SELECT ((c_custkey - klo) * 16) // (khi - klo + 1) AS kb,
               ((CAST(round(c_acctbal * 100) AS BIGINT) - alo) * 16)
                   // (ahi - alo + 1) AS ab
        FROM customer, b
    )
    SELECT CAST(
               (((kb >> 0) & 1) << 0) + (((ab >> 0) & 1) << 1)
             + (((kb >> 1) & 1) << 2) + (((ab >> 1) & 1) << 3)
             + (((kb >> 2) & 1) << 4) + (((ab >> 2) & 1) << 5)
             + (((kb >> 3) & 1) << 6) + (((ab >> 3) & 1) << 7)
           AS BIGINT) AS z,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM t GROUP BY 1
    """,
)
def zorder_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key arithmetic, hash-checked cross-
    engine: bucketize (c_custkey, cents(c_acctbal)) into 16 rank buckets
    each via exact integer math, interleave 4 bits of each into an 8-bit
    z value, and emit the z histogram. This is the key `zorder_layout`
    (operators/data_skipping.py) sorts by to make file-level min/max
    manifests prunable on EVERY indexed column — the histogram pins the
    bit arithmetic; the layout/pruning effect is pinned by
    tests/test_data_skipping.py.

    Scale notes: bounds come from one min/max agg broadcast to the scan
    (no collect in-plan here, so the oracle can mirror it); the z key is
    pure codegen bit arithmetic — zero extra shuffles beyond the final
    metadata-sized groupBy."""
    from pinterest_data_pipeline_spark.operators.data_skipping import (
        zorder_value,
    )

    cust = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    bounds = cust.agg(
        F.min("c_custkey").alias("klo"),
        F.max("c_custkey").alias("khi"),
        F.min(cents).alias("alo"),
        F.max(cents).alias("ahi"),
    )
    t = (
        cust.select(F.col("c_custkey"), cents.alias("cents"))
        .join(F.broadcast(bounds))
        .select(
            F.expr("((c_custkey - klo) * 16) div (khi - klo + 1)").alias("kb"),
            F.expr("((cents - alo) * 16) div (ahi - alo + 1)").alias("ab"),
        )
    )
    return (
        t.select(
            zorder_value([F.col("kb"), F.col("ab")], bits=4).alias("z")
        )
        .groupBy("z")
        .agg(F.count("*").alias("n"))
    )


@register(
    "levenshtein_similar_names",
    oracle="""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
    FROM part a JOIN part b
      ON a.p_type = b.p_type AND a.p_size = b.p_size
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def levenshtein_similar_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-match pairs, blocked on (p_type, p_size) so the
    quadratic comparison is bounded per block (~70 rows/block here) — the
    classic blocking+distance record-linkage shape. Block key choice is
    the scale lever: p_type alone left ~3300-row blocks → 33M distance
    computations; the composite key cuts that 50×."""
    part = load_table(spark, sf_dir, "part")
    a = part.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        F.col("p_type").alias("type_a"),
        F.col("p_size").alias("size_a"),
    )
    b = part.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        F.col("p_type").alias("type_b"),
        F.col("p_size").alias("size_b"),
    )
    return (
        a.join(
            b,
            (F.col("type_a") == F.col("type_b"))
            & (F.col("size_a") == F.col("size_b"))
            & (F.col("key_a") < F.col("key_b")),
        )
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= 3)
        .select("key_a", "key_b", "edit_dist")
    )


@register(
    "collect_segments_per_nation",
    oracle="""
    SELECT c_nationkey AS nationkey,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), '|')
               AS segments,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer GROUP BY 1
    """,
)
def collect_segments_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic array aggregation: collect_set is order-nondeterministic
    under shuffle, so the engine always sorts collected arrays before they
    become results (same family as the argmax rule). The result is emitted as
    a '|'-joined scalar string rather than array<string> so downstream
    value-hash comparators (which canonicalize scalar cells) can digest it."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.array_join(F.array_sort(F.collect_set("c_mktsegment")), "|").alias(
            "segments"
        ),
        F.count("*").alias("n_customers"),
    )


@register(
    "window_distribution_funcs",
    oracle="""
    SELECT c_custkey AS custkey,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions over a total order: ntile buckets,
    percent_rank, cume_dist."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return cust.select(
        F.col("c_custkey").alias("custkey"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "scalar_date_arithmetic",
    oracle="""
    SELECT o_orderkey AS orderkey,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00',
                          o_orderdate) AS INTEGER) AS days_since_epoch_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           date_trunc('week', o_orderdate) AS week_start
    FROM orders
    """,
)
def scalar_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic surface: offset, difference, month-end, week
    truncation (both engines start weeks on Monday)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey").alias("orderkey"),
        F.date_add(F.col("o_orderdate"), 30).cast("timestamp").alias("due_date"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).alias("days_since_epoch_start"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.date_trunc("week", "o_orderdate").alias("week_start"),
    )


@register(
    "approx_percentiles_sketch",
    oracle="""
    SELECT l_returnflag AS returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           true AS qty_p50_rank_ok,
           true AS price_p90_rank_ok
    FROM lineitem GROUP BY 1
    """,
)
def approx_percentiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles (approx_percentile): the scale alternative
    to the exact interpolated form in agg_percentiles — fixed-size sketch
    merged map-side instead of a per-group sort.

    GATE-ORACLE FORM (round-6 upgrade from rows-only): the sketch values
    themselves are engine-specific, so the registered output is the
    deterministic rank-error verdict for BOTH sketched statistics of the
    original query (p50 of l_quantity, p90 of l_extendedprice): the
    sketch value must sit at an empirical rank within target ± (0.002 +
    1/n). Tie-robust two-sided form — count(x < v)/n ≤ q + ε AND
    count(x ≤ v)/n ≥ q − ε — because l_quantity is small-integer-valued
    and heavily tied, where a one-sided count(≤)/n check would
    false-fail on any run of equal values straddling the target rank.
    The oracle pins group counts and `true`/`true`: a sketch excursion
    past its advertised rank error is a hard hash failure."""
    li = load_table(spark, sf_dir, "lineitem")
    approx = li.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.approx_percentile("l_quantity", 0.5, 10000).alias("__p50q"),
        F.approx_percentile("l_extendedprice", 0.9, 10000).alias("__p90p"),
    )
    counted = (
        li.select(
            F.col("l_returnflag").alias("returnflag"),
            "l_quantity",
            "l_extendedprice",
        )
        .join(F.broadcast(approx), "returnflag")
        .groupBy("returnflag")
        .agg(
            F.count("*").alias("n"),
            # per-statistic NON-NULL denominators: approx_percentile
            # sketches only non-NULL values, so the empirical rank must
            # be measured against the same population — dividing by the
            # group row count would false-fail the gate as soon as the
            # column carries NULLs
            F.count("l_quantity").alias("__qn"),
            F.count("l_extendedprice").alias("__pn"),
            F.count(
                F.when(F.col("l_quantity") < F.col("__p50q"), True)
            ).alias("__q_lt"),
            F.count(
                F.when(F.col("l_quantity") <= F.col("__p50q"), True)
            ).alias("__q_le"),
            F.count(
                F.when(F.col("l_extendedprice") < F.col("__p90p"), True)
            ).alias("__p_lt"),
            F.count(
                F.when(F.col("l_extendedprice") <= F.col("__p90p"), True)
            ).alias("__p_le"),
        )
    )

    def rank_ok(lt: str, le: str, nn: str, q: float):
        n = F.col(nn)
        eps = F.lit(0.002) + F.lit(1.0) / n
        ok = (F.col(lt) / n <= F.lit(q) + eps) & (
            F.col(le) / n >= F.lit(q) - eps
        )
        # an all-NULL group has no sketch and nothing to verify
        return F.when(n == 0, F.lit(True)).otherwise(ok)

    return counted.select(
        "returnflag",
        "n",
        rank_ok("__q_lt", "__q_le", "__qn", 0.5).alias("qty_p50_rank_ok"),
        rank_ok("__p_lt", "__p_le", "__pn", 0.9).alias("price_p90_rank_ok"),
    )


def _pds_oracle() -> str:
    """Oracle for python_datasource_clean_pins (rows-only → oracle
    upgrade, round 8): the data source's hash mode generates rows that
    are a pure function of the index through the portable md5-prefix
    hash, so DuckDB replays the IDENTICAL synthesis over a literal
    range spine, then the identical cleaning CTEs
    (plans/pinterest_driver, the machinery already proven by the green
    pinterest_q1..q5 rows), then the same aggregate."""
    from pinterest_data_pipeline_spark.plans.pinterest_driver import (
        _fixture_prefix,
    )

    spine = "SELECT CAST(unnest(range(0, 1000)) AS INTEGER) AS ind"
    return f"""
    {_fixture_prefix(spine)}
    SELECT category,
           CAST(COUNT(*) AS BIGINT) AS n_pins,
           CAST(SUM(follower_count) AS BIGINT) AS total_followers
    FROM pin_clean GROUP BY category
    """


@register("python_datasource_clean_pins", oracle=_pds_oracle())
def python_datasource_clean_pins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-extension: the reference's posting producer as a first-class
    Spark 4 Python Data Source (sources/emulation_source.py), composed
    directly with the cleaning pipeline — scan-side generation in
    executors replaces the reference's driver-side POST loop
    (user_posting_emulation.py:33-96). sf_dir is unused: the source
    generates its own deterministic rows (n=1000).

    Registered in the source's ``mode=hash`` (portable md5 synthesis,
    sources/fixtures.hash_pin_rows ≡ pinterest_driver.pin_raw_from_spine
    ≡ the oracle's pin_raw CTE — three-way parity pinned by
    tests/test_python_datasource.py), which is what upgraded this entry
    from rows-only to a full value oracle: DuckDB regenerates the same
    dirty rows from a range spine and replays cleaning + aggregate. The
    emulation mode (seeded random.Random, reference-faithful) remains
    the source's default for the streaming/batch parity tests."""
    from pinterest_data_pipeline_spark.operators.cleaning import clean_pin
    from pinterest_data_pipeline_spark.sources.emulation_source import (
        register_posting_emulation,
    )

    register_posting_emulation(spark)
    raw = (
        spark.read.format("posting_emulation")
        .option("topic", "pin")
        .option("n", "1000")
        .option("mode", "hash")
        .load()
    )
    return (
        clean_pin(raw)
        .groupBy("category")
        .agg(
            F.count("*").alias("n_pins"),
            F.sum("follower_count").alias("total_followers"),
        )
    )


@register(
    "collated_compare_segments",
    oracle="""
    SELECT CAST(COUNT(*) FILTER (WHERE lower(c_mktsegment) = 'building')
                AS BIGINT) AS n_building_ci,
           CAST(COUNT(*) FILTER (WHERE c_mktsegment = 'building')
                AS BIGINT) AS n_building_cs
    FROM customer
    """,
)
def collated_compare_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collation surface: the SAME equality predicate evaluated
    under UTF8_LCASE (case-insensitive) vs UTF8_BINARY (default)
    collation — declarative case-insensitivity instead of wrapping every
    operand in lower() (at scale that matters: a collated comparison
    keeps the column expression clean for pushdown and stats, where a
    lower() wrapper blocks both). The oracle states the lower() twin.
    """
    cust = load_table(spark, sf_dir, "customer")
    ci = F.collate(F.col("c_mktsegment"), "UTF8_LCASE") == F.lit("building")
    cs = F.col("c_mktsegment") == F.lit("building")
    return cust.agg(
        F.count(F.when(ci, True)).alias("n_building_ci"),
        F.count(F.when(cs, True)).alias("n_building_cs"),
    )


@register(
    "try_arithmetic_funcs",
    oracle="""
    SELECT CAST(COUNT(*) FILTER (WHERE o_orderkey % 2 = 0
                                    OR o_totalprice IS NULL) AS BIGINT)
               AS n_div_null,
           CAST(COUNT(*) AS BIGINT) AS n_add_null,
           CAST(COUNT(*) FILTER (
               WHERE o_orderpriority IS NULL
                  OR NOT regexp_matches(o_orderpriority, '^[0-9]+$')
           ) AS BIGINT) AS n_tonum_null
    FROM orders
    """,
)
def try_arithmetic_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe ``try_*`` arithmetic family: under Spark 4's default
    ANSI mode, division by zero / long overflow / bad numeric parses
    THROW; the try_ variants return NULL instead — the per-row error
    quarantine a 100 TB batch job needs (one dirty row must not kill a
    12-hour run). Counts of NULL results per failure class, checked
    against an oracle that states each failure condition directly
    (even order keys make the denominator ``o_orderkey % 2`` zero;
    Long.MAX + 1 overflows every row; priorities like '1-URGENT' never
    parse as numbers). A NULL input also yields a NULL try_* result —
    not a throw — so the oracle's failure predicates include the
    IS NULL legs; counting those rows is the point of the quarantine.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count(
            F.when(
                F.try_divide(
                    F.col("o_totalprice"), F.col("o_orderkey") % 2
                ).isNull(),
                True,
            )
        ).alias("n_div_null"),
        F.count(
            F.when(
                F.try_add(
                    F.lit(9223372036854775807), F.col("o_orderkey") + 1
                ).isNull(),
                True,
            )
        ).alias("n_add_null"),
        F.count(
            F.when(
                F.try_to_number(F.col("o_orderpriority"), F.lit("99999")).isNull(),
                True,
            )
        ).alias("n_tonum_null"),
    )


@register(
    "window_value_functions",
    oracle="""
    SELECT o_orderkey AS orderkey, o_custkey AS custkey,
           CAST(round(first_value(o_totalprice) OVER w * 100) AS BIGINT)
               AS first_cents,
           CAST(round(last_value(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate NULLS FIRST, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) * 100) AS BIGINT) AS last_cents,
           CAST(round(nth_value(o_totalprice, 2) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate NULLS FIRST, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) * 100) AS BIGINT) AS second_cents
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate NULLS FIRST, o_orderkey)
    """,
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window VALUE functions over each customer's order history:
    first/last/nth order price. The frame subtlety this pins: with a
    default frame (unbounded-preceding → current-row), ``last_value`` is
    just the current row and ``nth_value(2)`` is NULL until row 2 — the
    full-partition answer requires the explicit UNBOUNDED FOLLOWING
    frame, identically on both engines. Ordering carries the orderkey
    tie-break so value functions are deterministic under equal dates;
    NULL dates sort FIRST, pinned explicitly on both sides.

    Scale: one customer-keyed exchange; full-partition frames evaluate
    with a single pass per partition (no per-row rescans).
    """
    orders = load_table(spark, sf_dir, "orders")
    default_w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc_nulls_first(), "o_orderkey"
    )
    full_w = default_w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cents = lambda c: F.round(c * 100).cast("bigint")  # noqa: E731
    return orders.select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_custkey").alias("custkey"),
        cents(F.first("o_totalprice").over(default_w)).alias("first_cents"),
        cents(F.last("o_totalprice").over(full_w)).alias("last_cents"),
        cents(F.nth_value("o_totalprice", 2).over(full_w)).alias(
            "second_cents"
        ),
    )


@register(
    "hll_sketch_union_gate",
    oracle="""
    WITH exact AS (
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
               CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days
        FROM events
    )
    SELECT n_exact, n_days,
           CAST(0 AS BIGINT) AS n_violations
    FROM exact
    """,
)
def hll_sketch_union_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable sketch TABLES (Spark 4 Datasketches HLL): one HLL sketch
    per day is built and stored as binary state, and "distinct users over
    any date range" is answered by UNIONING the per-day sketches —
    never by rescanning events. This is the warehouse pattern for
    distinct-counting 100 TB of history: the sketch table is |days| rows,
    refresh is one new sketch per day, and range queries are
    O(days-in-range) merges.

    The driver-checked gate: the unioned estimate must sit within the
    ±3σ band of HLL at lgConfigK=12 (~2.5% rel. error) of the exact
    distinct — emitted as a violation count the oracle pins to 0, next
    to the exact values both engines compute directly.

    NULL-ts events land in a NULL-day quarantine sketch row: merged
    into the full-range union (their users still count) but excluded
    from ``n_days`` — a row with no timestamp is not a day.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    unioned = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.count("d").alias("n_days"),
    )
    exact = ev.agg(F.count_distinct("user_id").alias("n_exact"))
    return exact.crossJoin(unioned).select(
        "n_exact",
        "n_days",
        F.when(
            F.abs(F.col("est") - F.col("n_exact"))
            > 0.025 * F.col("n_exact") + 1,
            1,
        )
        .otherwise(0)
        .cast("bigint")
        .alias("n_violations"),
    )


@register(
    "bitmap_exact_distinct",
    oracle="""
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_events
    FROM events
    """,
)
def bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via roaring-style bitmap aggregation
    (Spark 3.5+ bitmap functions): ids bucket into 32k-bit bitmaps
    (`bitmap_bucket_number`/`bitmap_bit_position`), each bucket ORs its
    members' bits (`bitmap_construct_agg` — partial-combinable), and the
    distinct count is the sum of per-bucket popcounts. Unlike HLL this
    is exact — the oracle is plain COUNT(DISTINCT) — while shuffling
    only |buckets| bitmap blobs instead of every distinct id, and the
    stored per-bucket bitmaps are mergeable state for incremental
    refresh (the same property rollup_maintenance exploits for sums).
    """
    ev = load_table(spark, sf_dir, "events")

    def bitmap_distinct(col: str) -> DataFrame:
        return (
            ev.selectExpr(
                f"bitmap_bucket_number({col}) AS b",
                f"bitmap_bit_position({col}) AS p",
            )
            .groupBy("b")
            .agg(F.expr("bitmap_construct_agg(p)").alias("bm"))
            .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n"))
        )

    return (
        bitmap_distinct("user_id")
        .select(F.col("n").alias("n_users"))
        .crossJoin(
            bitmap_distinct("event_id").select(F.col("n").alias("n_events"))
        )
    )


@register(
    "approx_top_k_gate",
    oracle="""
    SELECT CAST(0 AS BIGINT) AS n_missing,
           CAST(3 AS BIGINT) AS k_true
    """,
)
def approx_top_k_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy gate for the `approx_top_k` sketch (Spark 4): every TRUE
    top-3 event type (by exact count, |event_types| is small so the
    sketch is effectively exact here) must appear in the sketch's top-5 —
    emitted as a missing-count the oracle pins to 0. Same gate pattern
    as `heavy_hitters_error_bound` (freqItems) and the HLL/percentile
    bounds: sketch outputs never enter the hash directly, their
    guaranteed properties do.
    """
    ev = load_table(spark, sf_dir, "events")
    sketch = ev.selectExpr("approx_top_k(event_type, 5) AS tk").select(
        F.explode("tk").alias("e")
    ).select(F.col("e.item").alias("event_type"))
    exact_top3 = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("event_type"))
        .limit(3)
        .select("event_type")
    )
    missing = exact_top3.join(sketch, "event_type", "anti")
    return missing.agg(
        F.count(F.lit(1)).alias("n_missing"),
        F.lit(3).cast("bigint").alias("k_true"),
    )


@register(
    "pivot_multi_value",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT')
                AS BIGINT) AS urgent_n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
               FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT)
               AS urgent_cents,
           CAST(COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW')
                AS BIGINT) AS low_n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
               FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT)
               AS low_cents
    FROM orders GROUP BY 1
    """,
)
def pivot_multi_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with MULTIPLE aggregates per pivoted column (count + money
    per priority): Spark names the outputs `<pivot>_<agg-alias>`, aliased
    here to the oracle's FILTER-clause formulation — which is also
    exactly how Catalyst lowers pivot internally (conditional
    aggregation), so the plan stays one partial+final hash aggregate
    with the explicit value list avoiding a distinct-scan for pivot
    values.
    """
    orders = load_table(spark, sf_dir, "orders")
    piv = (
        orders.groupBy(F.col("o_orderstatus").alias("status"))
        .pivot("o_orderpriority", ["1-URGENT", "5-LOW"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("cents"),
        )
    )
    return piv.select(
        "status",
        F.col("1-URGENT_n").alias("urgent_n"),
        F.col("1-URGENT_cents").alias("urgent_cents"),
        F.col("5-LOW_n").alias("low_n"),
        F.col("5-LOW_cents").alias("low_cents"),
    )


@register(
    "salted_topk_events_per_user",
    oracle="""
    SELECT user_id, CAST(rk AS INTEGER) AS rk, event_id, value
    FROM (
        SELECT user_id, event_id, value,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY value DESC, event_id ASC
               ) AS rk
        FROM events
    ) WHERE rk <= 5
    """,
)
def salted_topk_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe per-key top-k (operators/skew.salted_top_k): phase 1
    ranks within (user, salt) so a celebrity key's rows spread over 16
    tasks, phase 2 re-ranks the ≤ 16·k survivors. Output is IDENTICAL to
    the naive window for any total order — the oracle runs the naive
    window.

    Why it exists: a window over the hot key is the one skew shape no
    planner fixes (every row of the key must reach one task; partial
    aggregation rescues groupBy, AQE rescues joins — nothing rescues a
    window). When it pays is a BOUNDED-TASK-MEMORY question
    (scripts/skew_stress.py, SKEW.json): under memory pressure the
    single hot-task sort spills and salting wins 21.5 s → 4.6 s
    (30M rows, 50% hot); on an idle 128 GiB single JVM the straggler
    never spills and the naive window wins at every size tried — so on
    a real cluster (one core + a few GB per task) salt past a few
    million hot rows, and profile first via key_skew_profile_events.
    The same harness shows salting the plain count/sum AGGREGATION is
    always a loss: map-side partial aggregation absorbs the hot key."""
    from pinterest_data_pipeline_spark.operators.skew import salted_top_k

    ev = load_table(spark, sf_dir, "events")
    return salted_top_k(
        ev.select("user_id", "event_id", "value"),
        ["user_id"],
        [F.desc("value"), F.asc("event_id")],
        k=5,
    ).select("user_id", "rk", "event_id", "value")


@register(
    "set_except_all_multiset",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000.0
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_except_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag (multiset) difference: each left occurrence is
    cancelled by at most one right occurrence, so duplicate
    multiplicities survive (the DISTINCT form would collapse them).
    Spark plans this as a single shuffle with per-key counters, not an
    anti join; the inputs deliberately overlap so multiplicity handling
    is actually exercised."""
    orders = load_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 150000.0).select(
        F.col("o_custkey").alias("custkey")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return big.exceptAll(urgent)


@register(
    "set_intersect_all_multiset",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000.0
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_intersect_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag intersection: min of the two multiplicities
    per value survives."""
    orders = load_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 150000.0).select(
        F.col("o_custkey").alias("custkey")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return big.intersectAll(urgent)
