"""Top-1 / top-k per group ("argmax") operators.

The reference expresses "most popular X per G" as
``groupBy(G).agg(max(v), first(label))`` (reference README.md:460, 489,
521, 568) — but ``first()`` after a shuffle returns an arbitrary row's
label, NOT the argmax row's (SURVEY.md §2.5). This engine's primary
formulation is the deterministic ranking window:

    row_number() OVER (PARTITION BY G ORDER BY v DESC, tie-breaks ASC) = 1

which is what the reference's golden screenshots actually show, and the
only form an order-insensitive value-hash oracle can verify. The literal
``max+first`` form is kept for fidelity, documented as nondeterministic.

Scale note: the window is a single hash-shuffle on G followed by an
in-partition sort — same shuffle a groupBy would need, no extra pass.
For k=1 over high-cardinality groups this beats self-join-with-max
(one shuffle instead of two). Skewed G is handled by AQE skew-join off
the shuffle; the partial-agg path (groupBy first, window over the much
smaller aggregate) is what the canonical queries below use, so the window
input is |groups × labels|, not |rows|.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int = 1,
    rank_col: str | None = None,
) -> DataFrame:
    """Keep the top-``k`` rows per group, ranked by ``order_by``.

    ``order_by`` must impose a total order within each group (include
    tie-break columns) so the result is deterministic and oracle-checkable.
    """
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order_by)
    ranked = df.withColumn("__rn", F.row_number().over(w))
    out = ranked.filter(F.col("__rn") <= k)
    if rank_col is not None:
        return out.withColumnRenamed("__rn", rank_col)
    return out.drop("__rn")


def argmax_literal(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    label_cols: Sequence[str],
) -> DataFrame:
    """The reference's literal ``max + first`` idiom (README.md:460 etc.).

    NONDETERMINISTIC: ``first(label)`` is the label of an arbitrary row in
    the group post-shuffle, not the row achieving ``max(value)``. Exposed
    for API fidelity only; use :func:`top_per_group` for correct semantics.
    """
    aggs = [F.max(value_col).alias(value_col)]
    aggs += [F.first(c).alias(c) for c in label_cols]
    return df.groupBy(*group_cols).agg(*aggs)
