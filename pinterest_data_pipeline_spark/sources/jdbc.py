"""JDBC source (the reference's MySQL RDS origin — S1, SURVEY.md §2.1).

The reference's producers read MySQL via SQLAlchemy one row at a time
(`SELECT * FROM <t> LIMIT {offset}, 1`, user_posting_emulation.py:41-57).
The engine's equivalent is a proper parallel JDBC scan: partitioned on a
numeric column so N executors each read a key range — the difference
between 1 row/s and saturating the database's read capacity.

No JDBC driver jar ships in this environment, so the builder constructs
the reader (plan-side, no connection) and connection errors surface only
on action; ``require_driver()`` gives a clean early failure message.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_table_reader(
    spark: SparkSession,
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str = "com.mysql.cj.jdbc.Driver",
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetchsize: int = 10_000,
) -> DataFrame:
    """Build a (lazy) JDBC table scan.

    With ``partition_column`` + bounds, Spark issues ``num_partitions``
    range-predicated queries in parallel; without them the read is a
    single-connection bottleneck (acceptable only for dimension tables)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .option("fetchsize", str(fetchsize))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound/upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def require_driver(spark: SparkSession, driver: str = "com.mysql.cj.jdbc.Driver") -> bool:
    """True if the JDBC driver class is on the JVM classpath (it is not in
    this environment — callers should gate connection attempts on this)."""
    try:
        spark._jvm.java.lang.Class.forName(driver)  # noqa: SLF001
        return True
    except Exception:
        return False
