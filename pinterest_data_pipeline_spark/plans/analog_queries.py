"""The five canonical query SHAPES re-targeted at the driver testdata.

The reference's pin/geo/user tables do not exist in the driver's fixture
set, so the correctness harness runs each canonical pipeline shape
(SURVEY.md §2.11) over the TPC-H-ish tables using the FIXTURES.md §B
mapping: customer⋈nation⋈region plays the 3-way star join, ``year()`` on
``o_orderdate`` plays the per-year aggregations, ``c_acctbal`` plays the
follower-count argmax, acctbal buckets play the age ranges. The exact
reference semantics over pin/geo/user are covered by the fixture tests in
``tests/`` (generated Pinterest-shaped data).

Scale notes per query are in the builder docstrings; the common pattern:
aggregate first (partial map-side combine), run the argmax window over the
small aggregate, broadcast the dimension side of every join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.functions.buckets import value_bucket
from pinterest_data_pipeline_spark.operators.argmax import top_per_group
from pinterest_data_pipeline_spark.plans.registry import register
from pinterest_data_pipeline_spark.sources.parquet import load_table

# Acctbal buckets for the Q4 analog (age_range analog; boundaries chosen to
# split the [-999, 9999] acctbal domain into 4 non-trivial buckets).
_BAL_EDGES = [0.0, 3000.0, 7000.0]
_BAL_LABELS = ["negative", "low", "mid", "high"]

_BAL_BUCKET_SQL = """
    CASE WHEN c_acctbal IS NULL THEN NULL
         WHEN c_acctbal < 0.0 THEN 'negative'
         WHEN c_acctbal < 3000.0 THEN 'low'
         WHEN c_acctbal < 7000.0 THEN 'mid'
         ELSE 'high' END
"""


@register(
    "q1_top_segment_per_nation",
    oracle="""
    WITH counts AS (
        SELECT n_name AS nation, c_mktsegment AS segment,
               COUNT(*) AS segment_count
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2
    ), ranked AS (
        SELECT nation, segment, segment_count,
               ROW_NUMBER() OVER (
                   PARTITION BY nation
                   ORDER BY segment_count DESC, segment ASC) AS rn
        FROM counts
    )
    SELECT nation, segment, segment_count FROM ranked WHERE rn = 1
    """,
)
def q1_top_segment_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 shape: join → group-count → argmax per group (README.md:449-466).

    ``nation`` is a 25-row dimension → broadcast join, no shuffle for the
    join; the only shuffle is the groupBy, partial-aggregated map-side.
    """
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = customer.join(
        F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"], "inner"
    )
    counts = joined.groupBy(
        F.col("n_name").alias("nation"), F.col("c_mktsegment").alias("segment")
    ).agg(F.count("*").alias("segment_count"))
    return top_per_group(
        counts, ["nation"], [F.desc("segment_count"), F.asc("segment")]
    ).select("nation", "segment", "segment_count")


@register(
    "q2_top_priority_per_year",
    oracle="""
    WITH counts AS (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
               o_orderpriority AS priority, COUNT(*) AS priority_count
        FROM orders
        GROUP BY 1, 2
    ), ranked AS (
        SELECT order_year, priority, priority_count,
               ROW_NUMBER() OVER (
                   PARTITION BY order_year
                   ORDER BY priority_count DESC, priority ASC) AS rn
        FROM counts
    )
    SELECT order_year, priority, priority_count FROM ranked WHERE rn = 1
    """,
)
def q2_top_priority_per_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: year() derivation → group-count → argmax per year
    (README.md:474-495). Scan-only + one partial-agg shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    counts = (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .groupBy("order_year", F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").alias("priority_count"))
    )
    return top_per_group(
        counts, ["order_year"], [F.desc("priority_count"), F.asc("priority")]
    ).select("order_year", "priority", "priority_count")


@register(
    "q3a_top_customer_per_nation",
    oracle="""
    WITH per_customer AS (
        SELECT n_name AS nation, c_name AS customer,
               MAX(c_acctbal) AS acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2
    ), ranked AS (
        SELECT nation, customer, acctbal,
               ROW_NUMBER() OVER (
                   PARTITION BY nation
                   ORDER BY acctbal DESC, customer ASC) AS rn
        FROM per_customer
    )
    SELECT nation, customer, acctbal FROM ranked WHERE rn = 1
    """,
)
def q3a_top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3a shape: 3-way star join → group-max → argmax per group
    (README.md:504-527). Both dimensions broadcast; the fact side never
    shuffles for the joins."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = customer.join(
        F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"], "inner"
    ).join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"], "inner")
    per_customer = joined.groupBy(
        F.col("n_name").alias("nation"), F.col("c_name").alias("customer")
    ).agg(F.max("c_acctbal").alias("acctbal"))
    return top_per_group(
        per_customer, ["nation"], [F.desc("acctbal"), F.asc("customer")]
    ).select("nation", "customer", "acctbal")


@register(
    "q3b_top_nation_overall",
    oracle="""
    WITH per_customer AS (
        SELECT n_name AS nation, c_name AS customer,
               MAX(c_acctbal) AS acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2
    ), ranked AS (
        SELECT nation, customer, acctbal,
               ROW_NUMBER() OVER (
                   PARTITION BY nation
                   ORDER BY acctbal DESC, customer ASC) AS rn
        FROM per_customer
    ), per_nation AS (
        SELECT nation, acctbal FROM ranked WHERE rn = 1
    )
    SELECT nation, acctbal FROM per_nation
    ORDER BY acctbal DESC, nation ASC LIMIT 1
    """,
)
def q3b_top_nation_overall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3b shape: Q3a → global top-1 (README.md:529-533). The grand
    aggregate runs over ≤|nations| rows — trivially driver-sized."""
    q3a = q3a_top_customer_per_nation(spark, sf_dir)
    return (
        q3a.orderBy(F.desc("acctbal"), F.asc("nation"))
        .limit(1)
        .select("nation", "acctbal")
    )


@register(
    "q4_top_priority_per_balance_bucket",
    oracle=f"""
    WITH bucketed AS (
        SELECT {_BAL_BUCKET_SQL} AS bal_bucket, o_orderpriority AS priority
        FROM orders JOIN customer ON o_custkey = c_custkey
    ), counts AS (
        SELECT bal_bucket, priority, COUNT(*) AS priority_count
        FROM bucketed GROUP BY 1, 2
    ), ranked AS (
        SELECT bal_bucket, priority, priority_count,
               ROW_NUMBER() OVER (
                   PARTITION BY bal_bucket
                   ORDER BY priority_count DESC, priority ASC) AS rn
        FROM counts
    )
    SELECT bal_bucket, priority, priority_count FROM ranked WHERE rn = 1
    """,
)
def q4_top_priority_per_balance_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: join → bucketing function → group-count → argmax
    (README.md:546-574). Bucketing is a native CASE WHEN (the reference
    used a Python UDF — see functions/buckets.py for why we don't)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = orders.join(customer, orders["o_custkey"] == customer["c_custkey"], "inner")
    counts = (
        joined.withColumn("bal_bucket", value_bucket("c_acctbal", _BAL_EDGES, _BAL_LABELS))
        .groupBy("bal_bucket", F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").alias("priority_count"))
    )
    return top_per_group(
        counts, ["bal_bucket"], [F.desc("priority_count"), F.asc("priority")]
    ).select("bal_bucket", "priority", "priority_count")


@register(
    "q5_orders_per_year",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           COUNT(*) AS order_count
    FROM orders GROUP BY 1
    """,
)
def q5_orders_per_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: year() → group-count (README.md:583-592), no-dedup
    semantics preserved (counts rows, not distinct users)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .groupBy("order_year")
        .agg(F.count("*").alias("order_count"))
        .select("order_year", "order_count")
    )


@register(
    "bilateral_trade_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS volume_cents,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name < n2.n_name
    GROUP BY 1, 2, 3
    """,
)
def bilateral_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped 6-relation join DAG: line items bridged to BOTH a
    supplier nation and a customer nation (nation joined twice under
    different aliases), yearly bilateral volume in integer cents. The
    ``n1 < n2`` predicate keeps one row per unordered nation pair.

    Scale: the fact table (lineitem) is joined only through
    broadcast-eligible sides — supplier, the two nation aliases, and
    customer/orders dims — so the physical plan keeps the fact scan
    unshuffled until the final (nation, nation, year) aggregation, whose
    key space is |nations|²·|years| (metadata-sized). The discount math
    is rounded to cents BEFORE summation, making the aggregate exact and
    order-independent cross-engine.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    volume_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    return (
        li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            F.sum(volume_cents).alias("volume_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "local_supplier_volume",
    oracle="""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS volume_cents,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
                  AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY 1, 2
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue from orders where the supplier and the
    customer share a nation ("local" supply), per Asian nation and year.
    The interesting predicate is the two-column supplier join
    (``l_suppkey`` AND same-nation) — a join condition spanning
    relations, which Catalyst still plans as one broadcast hash join
    with a composite key.

    Scale: as in `bilateral_trade_volume`, the fact scan joins only
    broadcast-eligible sides (orders/customer carry the probe; supplier/
    nation/region broadcast, with the region filter pruning nations
    BEFORE anything touches lineitem), and the single shuffle is the
    (nation, year) aggregation. Money is exact integer cents.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == "ASIA"
    )
    volume_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg(
            F.sum(volume_cents).alias("volume_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------- round-3 TPC-H shape fill-in
#
# Four more canonical TPC-H plan shapes, adapted to this testdata's
# columns (no partsupp/phone): the left-join count histogram (Q13), the
# HAVING-gated IN subquery (Q18), the aggregate-over-aggregate share
# gate (Q11), and the anti-join + scalar-average gate (Q22). Each brings
# a distinct optimizer shape the suite didn't yet pin.


@register(
    "order_count_histogram",
    oracle="""
    WITH c_orders AS (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by (filtered) order
    count, INCLUDING zero-order customers — which is why the join must
    be a left outer with the filter in the JOIN CONDITION, not a WHERE
    (a WHERE would silently turn it inner and drop the zero bucket).

    Scale: one shuffle join on custkey (orders side pre-filtered
    map-side), one partial-agg count per customer, then a tiny
    histogram rollup. COUNT(col) ignores the left join's NULLs — no
    special-casing."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    c_orders = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy(F.col("c_count").cast("bigint").alias("c_count")).agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )


@register(
    "big_order_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 120
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def big_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers holding orders whose total quantity
    crosses a threshold — the HAVING-gated IN subquery. Catalyst plans
    the IN as a left-semi join against the aggregated subquery, so the
    fact table is scanned twice but SHUFFLED once per purpose, and the
    gate aggregation is partial-combined map-side. Quantity totals go
    through DECIMAL so both engines sum exactly."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    gate = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 120)
        .select("l_orderkey")
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            gate.withColumnRenamed("l_orderkey", "o_orderkey"),
            "o_orderkey",
            "semi",
        )
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty")
        )
    )


@register(
    "part_revenue_share_gate",
    oracle="""
    WITH pr AS (
        SELECT l_partkey,
               SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) AS rev_cents
        FROM lineitem GROUP BY l_partkey
    ), g AS (
        SELECT CAST(SUM(rev_cents) AS HUGEINT) AS tot,
               CAST(COUNT(*) AS HUGEINT) AS n
        FROM pr
    )
    SELECT l_partkey, CAST(rev_cents AS BIGINT) AS rev_cents
    FROM pr, g
    WHERE 2 * CAST(rev_cents AS HUGEINT) * n > 3 * tot
    """,
)
def part_revenue_share_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: keep parts whose revenue exceeds a multiple of
    the MEAN part revenue — aggregate filtered by an aggregate over
    itself (share-of-total adapted to a scale-invariant gate: a fixed
    fraction of the grand total selects nothing once the part count
    grows, while k×mean keeps a stable tail at every SF).
    The per-part rollup is computed once and reused for both the gate
    scalar and the output (self-referencing CTE); exact integer cents
    make the share comparison bit-stable.

    The gate itself is exact integer arithmetic: ``rev > 1.5·mean`` is
    evaluated as ``2·rev·n > 3·total`` (no division, no double
    accumulation — an AVG-based gate sums doubles in partition order
    and a boundary-sitting part could flip membership between engines;
    same discipline as dormant_rich_customers). The products run in
    DECIMAL/HUGEINT internally so they cannot overflow at any SF.

    Scale: one shuffle on partkey; the grand total is a 1-row broadcast
    (scalar subquery), never a second scan of lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    # materialize the per-part rollup once: the gate scalar and the
    # output both read it, and Catalyst's ReuseExchange did not dedupe
    # the two aggregate branches here (verified in the formatted plan) —
    # without the barrier the FACT table is scanned and shuffled twice.
    # The checkpointed relation is |parts| rows, tiny next to lineitem.
    pr = (
        li.groupBy("l_partkey")
        .agg(F.sum(rev).alias("rev_cents"))
        .localCheckpoint(eager=False)
    )
    total = pr.agg(
        F.sum("rev_cents").cast("decimal(20,0)").alias("__tot"),
        F.count(F.lit(1)).cast("decimal(20,0)").alias("__n"),
    )
    return (
        pr.crossJoin(F.broadcast(total))
        .filter(
            F.col("rev_cents").cast("decimal(20,0)") * F.lit(2) * F.col("__n")
            > F.lit(3) * F.col("__tot")
        )
        .select("l_partkey", F.col("rev_cents").cast("bigint").alias("rev_cents"))
    )


@register(
    "dormant_rich_customers",
    oracle="""
    WITH gate AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS ab
        FROM customer
        WHERE c_acctbal > 0.0 AND c_nationkey % 2 = 0
    )
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               AS totacctbal
    FROM customer, gate
    WHERE c_nationkey % 2 = 0
      AND c_acctbal > ab
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
)
def dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: nationkey band instead of phone
    prefixes): customers in selected nations with above-average balance
    and no RECENT order (none since 1998 — in this testdata every
    customer has some order, so Q22's "never ordered" is adapted to
    dormancy, keeping the anti-join shape with a pushed-down date
    predicate on the anti side). The average is
    computed as exact-DECIMAL sum / count so both engines derive the
    identical threshold (a streamed double AVG is partition-order
    dependent in its last bits, and a boundary-sitting balance would
    then flip membership between engines).

    Scale: gate is a 1-row broadcast; the anti join shuffles on custkey
    only for customers passing the balance filter (selectivity applied
    before the join); one final rollup on nationkey."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    band = F.col("c_nationkey") % 2 == 0
    gate = (
        cust.filter((F.col("c_acctbal") > 0.0) & band)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("ab")
        )
    )
    return (
        cust.filter(band)
        .crossJoin(F.broadcast(gate))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(
            orders.filter(
                F.col("o_orderdate")
                >= F.lit("1998-01-01 00:00:00").cast("timestamp")
            ),
            F.col("c_custkey") == F.col("o_custkey"),
            "anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )
