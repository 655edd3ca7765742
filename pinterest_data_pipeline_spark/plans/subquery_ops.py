"""SQL subquery surface: correlated scalar, EXISTS, and IN subqueries.

The reference exposes its query surface through dataframe-style calls
only (README.md:339-592); an engine a reference user switches to also
needs the SQL forms analysts actually write. These queries exercise
Catalyst's subquery decorrelation: a correlated subquery that naively
means "re-run per outer row" (O(n·m), a nested loop) is rewritten into
one aggregate + one equi-join — the difference between a plan that
finishes and one that doesn't at 100 TB. `tests/test_plan_quality.py`
pins the decorrelated shape (hash joins, no BroadcastNestedLoopJoin /
CartesianProduct in any of these plans).

Determinism: aggregates that feed comparisons or outputs go through
DECIMAL (exact, partition-order independent) before any double math, per
the repo-wide oracle-parity rules (`plans/relational_ops.py` header).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pinterest_data_pipeline_spark.plans.registry import register
from pinterest_data_pipeline_spark.sources.parquet import load_table


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"sq_{t}")


@register(
    "scalar_subquery_low_qty",
    oracle="""
    SELECT p_brand AS brand,
           CAST(COUNT(*) AS BIGINT) AS n_small_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
      AND l.l_quantity < 0.2 * (
            SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*)
            FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    GROUP BY p_brand ORDER BY brand
    """,
)
def scalar_subquery_low_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lineitems below 20% of their part's average
    quantity. The correlated scalar aggregate decorrelates into one
    per-part aggregate joined back on partkey (no per-row re-execution).
    The per-part mean is decimal-sum / bigint-count — one double divide
    from exact operands, so the `<` comparison is bit-identical across
    engines and partition orders."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        """
        SELECT p_brand AS brand,
               CAST(COUNT(*) AS BIGINT) AS n_small_lines,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_price
        FROM sq_lineitem l JOIN sq_part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
          AND l.l_quantity < 0.2 * (
                SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
                            AS DOUBLE) / COUNT(*)
                FROM sq_lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        GROUP BY p_brand ORDER BY brand
        """
    )


@register(
    "exists_late_ship_orders",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority ORDER BY priority
    """,
)
def exists_late_ship_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted to this testdata's columns): orders with at
    least one lineitem shipped >60 days after the order date, counted per
    priority.

    The naive form is the correlated EXISTS the oracle runs; Catalyst
    decorrelates it to a left-semi join whose build side is the FULL
    (orderkey, shipdate) fact projection — 30× stress showed that plan
    broadcast-building an 18M-row hash relation (11.3× time at 30× data,
    and a straight scale-killer past the broadcast threshold). Because the
    residual predicate is monotone in l_shipdate, EXISTS(ship > cutoff) ≡
    max(ship) per orderkey > cutoff, so the engine pre-reduces lineitem to
    one row per orderkey with a map-side-combined aggregate and joins
    THAT: the join input shrinks ~4×, the aggregate is linear, and the
    plan stays a plain shuffle join at any scale (measured 17 s → 4.5 s at
    30×; same result set, pinned by the unchanged EXISTS oracle)."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM sq_orders o
        JOIN (SELECT l_orderkey, MAX(l_shipdate) AS max_ship
              FROM sq_lineitem GROUP BY l_orderkey) m
          ON m.l_orderkey = o.o_orderkey
         AND m.max_ship > o.o_orderdate + INTERVAL 60 DAY
        GROUP BY o_orderpriority ORDER BY priority
        """
    )


@register(
    "in_subquery_big_spenders",
    oracle="""
    SELECT c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_acctbal
    FROM customer
    WHERE c_custkey IN (
        SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    GROUP BY c_mktsegment ORDER BY segment
    """,
)
def in_subquery_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated IN subquery: customers holding at least one
    >400k-total order, aggregated per market segment. Catalyst plans the
    IN list as a semi join against the deduplicated subquery — never a
    broadcast of a collected value list."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_mktsegment AS segment,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_acctbal
        FROM sq_customer
        WHERE c_custkey IN (
            SELECT o_custkey FROM sq_orders WHERE o_totalprice > 400000)
        GROUP BY c_mktsegment ORDER BY segment
        """
    )


@register(
    "lateral_topk_orders_per_customer",
    oracle="""
    SELECT c_custkey AS custkey, t.o_orderkey AS orderkey,
           CAST(round(t.o_totalprice * 100) AS BIGINT) AS total_cents
    FROM customer,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c_custkey
             ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 3) t
    WHERE c_custkey < 300
    """,
)
def lateral_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (Spark 4 SQL): each customer's top-3
    orders by price — the per-row-subquery formulation of grouped top-k.
    Catalyst decorrelates the LATERAL into a ranked window / limited join
    rather than executing a per-customer probe, which is what makes the
    construct survive a 100 TB orders table; the DataFrame twin of this
    exact shape is `window_rank_top3`.

    Total price is emitted in integer cents on both sides so the hash
    compare never sees raw float arithmetic.
    """
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "lat_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("lat_orders")
    return spark.sql(
        """
        SELECT c_custkey AS custkey, t.o_orderkey AS orderkey,
               CAST(round(t.o_totalprice * 100) AS BIGINT) AS total_cents
        FROM lat_customer,
        LATERAL (SELECT o_orderkey, o_totalprice FROM lat_orders
                 WHERE o_custkey = c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 3) t
        WHERE c_custkey < 300
        """
    )
