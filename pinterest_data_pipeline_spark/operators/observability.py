"""In-flight data-quality observation via ``df.observe``.

``observe`` attaches aggregate metrics to a plan that are collected AS A
SIDE EFFECT of whatever action runs — no second scan, no separate
quality job. At 100 TB that difference is the whole point: a curation
pipeline gets its row counts, null rates, and bounds violations for free
on the same pass that writes the output.

Metrics must be commutative/associative aggregates (they merge across
tasks); everything below is count/sum-based for exactly that reason.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def quality_observation(
    df: DataFrame,
    *,
    not_null: list[str] | None = None,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach a quality observation to ``df``.

    - ``not_null``: columns whose NULL count is tracked (``<col>_nulls``).
    - ``bounds``: column → (lo, hi); rows outside [lo, hi] are counted as
      ``<col>_oob``.

    Returns (instrumented df, Observation). After any action on the
    returned df, ``observation.get`` holds the metrics dict. The metrics
    ride the existing pass — check with ``.explain()``: the plan gains a
    CollectMetrics node, never a second scan.
    """
    metrics: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in not_null or []:
        metrics.append(
            F.count(F.when(F.col(c).isNull(), True)).alias(f"{c}_nulls")
        )
    for c, (lo, hi) in (bounds or {}).items():
        metrics.append(
            F.count(
                F.when((F.col(c) < lo) | (F.col(c) > hi), True)
            ).alias(f"{c}_oob")
        )
    obs = Observation()
    return df.observe(obs, *metrics), obs
