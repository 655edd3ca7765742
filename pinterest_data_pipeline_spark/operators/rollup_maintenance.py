"""Incremental rollup maintenance: merge partial aggregates instead of
recomputing history.

At 100 TB the aggregate-refresh anti-pattern is re-scanning the full fact
history every time a new partition lands. For algebraic aggregates
(count/sum/min/max — and anything derivable from them, e.g. avg), the
rollup over (history ∪ delta) equals an aggregate-of-aggregates: keep the
per-key partial state table, aggregate ONLY the new delta, and combine
the two small states. The refresh cost becomes O(|delta| + |state|),
independent of history size.

Spark-first mechanics: the partial state is just a DataFrame with
mergeable columns (`n`, decimal `sum`, `min`, `max`); `merge_rollups`
is a unionByName + one groupBy — map-side combinable, one shuffle on the
rollup keys, broadcast-joinable downstream. Sums stay DECIMAL until the
final derive step so merge order never changes a bit (repo determinism
rule, `plans/relational_ops.py` header).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_state(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """Aggregate a fact slice into mergeable per-key partial state."""
    return df.groupBy(*keys).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("sum_dec"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def merge_rollups(*states: DataFrame) -> DataFrame:
    """Combine partial-state tables over the same keys: counts and decimal
    sums add, min/max fold — associative and commutative, so any merge
    tree (per-batch, per-day, per-region) yields the same state."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    keys = [c for c in merged.columns if c not in ("n", "sum_dec", "min_v", "max_v")]
    return merged.groupBy(*keys).agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("sum_dec").alias("sum_dec"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def finalize_rollup(state: DataFrame) -> DataFrame:
    """Derive the user-facing aggregate view from mergeable state
    (sum/avg as doubles, one cast at the very end)."""
    return state.select(
        *[c for c in state.columns if c not in ("n", "sum_dec", "min_v", "max_v")],
        F.col("n"),
        F.col("sum_dec").cast("double").alias("sum_v"),
        # double division of exact operands — bit-identical across engines
        # (decimal division scale rules differ between engines; double-first
        # does one IEEE op from exact inputs)
        (F.col("sum_dec").cast("double") / F.col("n")).alias("avg_v"),
        "min_v",
        "max_v",
    )
