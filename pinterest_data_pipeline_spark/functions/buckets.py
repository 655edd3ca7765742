"""Bucketing functions (the reference's ``age_range`` UDF and analogs).

The reference implements age bucketing as a row-at-a-time Python UDF
(reference README.md:553-560). That is the slow path: every row round-trips
driver-pickled Python, breaking whole-stage codegen. The engine's primary
form is a native ``CASE WHEN`` chain — bit-identical output, JVM-side,
Catalyst-optimizable — with the UDF kept as an explicitly-exercised
compatibility variant (SURVEY.md §2.10).

Boundary semantics preserved exactly (README.md:553-556): <25 → '18-24',
25-35 inclusive → '25-35', 36-50 inclusive → '36-50', else '+50'.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def age_range(age: Column | str) -> Column:
    """Native CASE WHEN age bucketing — the engine's primary form.

    NULL age → NULL (the bare ``otherwise('+50')`` would swallow NULLs
    into the top bucket, silently diverging from the UDF variant — caught
    by the hypothesis property test)."""
    c = F.col(age) if isinstance(age, str) else age
    return (
        F.when(c.isNull(), F.lit(None).cast("string"))
        .when(c < 25, "18-24")
        .when((c >= 25) & (c <= 35), "25-35")
        .when((c >= 36) & (c <= 50), "36-50")
        .otherwise("+50")
    )


def _age_range_py(age: int | None) -> str | None:
    if age is None:
        return None
    if age < 25:
        return "18-24"
    if 25 <= age <= 35:
        return "25-35"
    if 36 <= age <= 50:
        return "36-50"
    return "+50"


#: Row-at-a-time UDF variant, mirroring the reference's literal form
#: (README.md:553-560). Kept to exercise the UDF surface; do not use in
#: hot paths — see module docstring.
age_range_udf = F.udf(_age_range_py, T.StringType())


def value_bucket(value: Column | str, edges: list[float], labels: list[str]) -> Column:
    """Generic monotone bucketing: ``len(edges)+1`` buckets from sorted
    ``edges``; ``labels`` has ``len(edges)+1`` entries. NULL in → NULL out."""
    if len(labels) != len(edges) + 1:
        raise ValueError("labels must have len(edges)+1 entries")
    c = F.col(value) if isinstance(value, str) else value
    expr = F.when(c.isNull(), F.lit(None).cast("string"))
    for edge, label in zip(edges, labels):
        expr = expr.when(c < edge, label)
    return expr.otherwise(labels[-1])
