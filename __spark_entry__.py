"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (Q3 shape — 3-way star join + two-level
  aggregation + argmax, the reference's only benchmarked query) at sf0.001.
- ``queries()``: every implemented operator from SURVEY.md §2 + extensions,
  as ``(spark, sf_dir) -> DataFrame`` builders.
- ``oracle_sql()``: matching DuckDB SQL for each oracle-expressible query.

The real inventory lives in ``pinterest_data_pipeline_spark.plans.registry``;
importing the plan modules below populates it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Importing these modules registers their queries into the shared registry.
import pinterest_data_pipeline_spark.plans.analog_queries  # noqa: F401
from pinterest_data_pipeline_spark.plans.registry import (
    ORACLE,
    QUERIES,
    ordered_queries,
)

try:  # optional modules appear as rounds progress; keep entry importable
    import pinterest_data_pipeline_spark.plans.relational_ops  # noqa: F401
except ImportError:
    pass
try:
    import pinterest_data_pipeline_spark.plans.training_data  # noqa: F401
except ImportError:
    pass
try:
    import pinterest_data_pipeline_spark.plans.streaming_queries  # noqa: F401
except ImportError:
    pass
try:
    import pinterest_data_pipeline_spark.plans.advanced_ops  # noqa: F401
except ImportError:
    pass
try:
    import pinterest_data_pipeline_spark.plans.maintenance_ops  # noqa: F401
except ImportError:
    pass
try:
    import pinterest_data_pipeline_spark.plans.subquery_ops  # noqa: F401
except ImportError:
    pass
try:
    import pinterest_data_pipeline_spark.plans.nonequi_ops  # noqa: F401
except ImportError:
    pass
try:
    import pinterest_data_pipeline_spark.plans.recursive_ops  # noqa: F401
except ImportError:
    pass
try:
    import pinterest_data_pipeline_spark.plans.timeseries_ops  # noqa: F401
except ImportError:
    pass
try:
    import pinterest_data_pipeline_spark.plans.graph_ops  # noqa: F401
except ImportError:
    pass
try:
    import pinterest_data_pipeline_spark.plans.profiling_ops  # noqa: F401
except ImportError:
    pass
try:
    import pinterest_data_pipeline_spark.plans.semistructured_ops  # noqa: F401
except ImportError:
    pass
try:
    import pinterest_data_pipeline_spark.plans.round5_promotions  # noqa: F401
except ImportError:
    pass
try:
    import pinterest_data_pipeline_spark.plans.pinterest_driver  # noqa: F401
except ImportError:
    pass
try:
    import pinterest_data_pipeline_spark.plans.staged_round6  # noqa: F401
except ImportError:
    pass
try:
    import pinterest_data_pipeline_spark.plans.staged_round7  # noqa: F401
except ImportError:
    pass
try:
    import pinterest_data_pipeline_spark.plans.staged_round8  # noqa: F401
except ImportError:
    pass
try:
    import pinterest_data_pipeline_spark.plans.staged_round9  # noqa: F401
except ImportError:
    pass
try:
    import pinterest_data_pipeline_spark.plans.staged_round10  # noqa: F401
except ImportError:
    pass
try:
    # fully promoted as of round 11 (PROMOTED_IN_ROUND10 + ROUND11)
    import pinterest_data_pipeline_spark.plans.staged_round11  # noqa: F401
except ImportError:
    pass
try:
    # fully promoted as of round 12 (PROMOTED_IN_ROUND11 + ROUND12)
    import pinterest_data_pipeline_spark.plans.staged_round12  # noqa: F401
except ImportError:
    pass
try:
    # fully promoted as of round 12 (PROMOTED_IN_ROUND12, all 10)
    import pinterest_data_pipeline_spark.plans.staged_round13  # noqa: F401
except ImportError:
    pass

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pinterest_data_pipeline_spark.plans.analog_queries import (
        q3a_top_customer_per_nation,
    )

    return q3a_top_customer_per_nation(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, in driver-check
    priority order: the external driver verifies a fixed-size prefix (50 in
    round 1), so not-yet-verified / changed / new queries lead and
    long-green heavy queries trail (registry.CHECK_FIRST rationale)."""
    return ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys → rows-only check."""
    return dict(ORACLE)
