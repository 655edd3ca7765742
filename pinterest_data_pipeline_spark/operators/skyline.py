"""2-D skyline (Pareto frontier) — the classic dominance operator
(Börzsönyi et al. 2001's SKYLINE OF): keep every row no other row
dominates, where row A dominates row B if A is no worse on both
dimensions and strictly better on at least one. Here: MINIMIZE
``x_col`` and MAXIMIZE ``y_col`` — the price/quality frontier a buyer
or a ranker-tradeoff audit reads.

The textbook sort-based algorithm needs one globally-ordered prefix
max (a row survives iff its y beats the best y among all strictly
cheaper rows, and it is the best y at its own x). A naive window over
ORDER BY x is a SinglePartition scan — dead at scale — so this uses
the watermark-lateness two-level decomposition (operators/lateness.py
precedent):

1. band the x axis into fixed ranges (``x div band_width``),
2. per-band max(y) — one map-side-combinable aggregate to a
   metadata-sized band table,
3. EXCLUSIVE prefix-max across the band table (tiny window),
4. broadcast that back; within each band a PARTITIONED window gives
   the prefix max over same-band strictly-cheaper rows; the survivor
   predicate combines both levels.

Row-for-row equal to the global window: a band boundary never loses
information (the cross-band prefix covers everything cheaper than the
band, the in-band window covers the rest).

Exactness: both dimensions are integers (cents / size); the survivor
predicate is pure integer comparison — no doubles anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    band_width: int = 1024,
) -> DataFrame:
    """Rows minimizing ``x_col`` / maximizing ``y_col`` that no other
    row dominates. Ties: among rows with identical x, only rows with
    the band's maximal y at that x survive (an equal-x higher-y row
    dominates); exact duplicates on (x, y) all survive (no strict
    inequality exists between them). Rows missing EITHER coordinate
    are excluded up front — dominance is undefined against a NULL, and
    an unfiltered NULL row would survive a SQL NOT-EXISTS replay (every
    comparison against it is NULL) while the window formulation drops
    it, a silent cross-engine split. Input columns pass through."""
    base = (
        df.withColumn("__x", F.col(x_col).cast("long"))
        .withColumn("__y", F.col(y_col).cast("long"))
        .filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    )
    banded = base.withColumn(
        "__band", F.floor(F.col("__x") / F.lit(band_width)).cast("long")
    )
    band_max = banded.groupBy("__band").agg(F.max("__y").alias("__bmax"))
    w_prev = (
        Window.orderBy("__band")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # metadata-sized window: |bands| rows
    band_prefix = band_max.select(
        "__band", F.max("__bmax").over(w_prev).alias("__prev_bands_max")
    )
    w_in = (
        Window.partitionBy("__band")
        .orderBy("__x")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same_x = Window.partitionBy("__band", "__x")
    scored = (
        banded.join(F.broadcast(band_prefix), "__band")
        .withColumn("__in_band_prev_max", F.max("__y").over(w_in))
        .withColumn("__same_x_max", F.max("__y").over(w_same_x))
    )
    cheaper_max = F.greatest(
        F.coalesce(F.col("__prev_bands_max"), F.lit(-(2**62))),
        F.coalesce(F.col("__in_band_prev_max"), F.lit(-(2**62))),
    )
    return scored.where(
        (F.col("__y") > cheaper_max)
        & (F.col("__y") == F.col("__same_x_max"))
    ).drop(
        "__x",
        "__y",
        "__band",
        "__bmax",
        "__prev_bands_max",
        "__in_band_prev_max",
        "__same_x_max",
    )
