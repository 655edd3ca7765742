"""Count-min sketch (Cormode & Muthukrishnan '05) built from first
principles on DataFrames — the mergeable fixed-size frequency summary
that answers "how often does item x occur?" over a stream/corpus far
too large to hold exact counts for, with one-sided error: estimates
never undercount, and overcount by at most εN with high probability
(ε ≈ e/width).

This complements the built-in sketch surface (HLL distinct, KLL
percentiles, freqItems heavy hitters) with an explicitly-constructed
sketch whose every counter is SQL-replayable: the row hashes are the
repo's portable md5-prefix hash, so a DuckDB oracle rebuilds the
identical depth×width counter matrix and the identical estimates —
the same discipline that made the MinHash/LSH family value-verifiable.

Scale: building the sketch is ONE partial-combinable aggregate to
depth×width rows (each input row contributes `depth` increments —
map-side combine collapses them long before the shuffle); the sketch
is constant-size regardless of corpus, which is the entire point.
Estimation joins probes to the broadcast counter matrix. Sketches from
disjoint shards merge by adding counters (groupBy sum) — associative
by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.operators.dedup import portable_hash32


def _bucket(item, j: int, width: int, salt: str):
    return (
        portable_hash32(F.concat(F.lit(f"{salt}{j}:"), item.cast("string")))
        % width
    )


def count_min_build(
    items: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """The sketch: (j, bucket, cnt) counters, one row per non-empty
    cell (absent cells are implicitly 0). Each input row increments
    ``depth`` cells; the explode happens inside one aggregate, so the
    shuffle carries at most depth×width combined rows per partition."""
    item = F.col(item_col)
    cells = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("int").alias("j"),
                        _bucket(item, j, width, salt)
                        .cast("bigint")
                        .alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("__c")
    )
    return (
        cells.groupBy(
            F.col("__c.j").alias("j"), F.col("__c.bucket").alias("bucket")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def count_min_estimate(
    counters: DataFrame,
    probes: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Point-frequency estimates for the probe items: est = min over
    the item's ``depth`` counters (missing cell ⇒ 0). Carries every
    probe column through; adds ``est_n``. The counter matrix is
    broadcast — it is ≤ depth×width rows by construction."""
    item = F.col(item_col)
    pb = probes.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("int").alias("j"),
                        _bucket(item, j, width, salt)
                        .cast("bigint")
                        .alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("__c"),
    )
    carry = [c for c in probes.columns]
    return (
        pb.join(
            F.broadcast(counters),
            (F.col("__c.j") == F.col("j"))
            & (F.col("__c.bucket") == F.col("bucket")),
            "left",
        )
        .groupBy(*[F.col(c) for c in carry])
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("est_n")
        )
    )
