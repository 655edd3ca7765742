"""Delta-varint encoding payoff report — the layout-engineering sibling
of operators/zorder's pruning report: WHERE zorder measures how a
layout changes what a query must READ, this measures how a layout
changes what the format can STORE. Parquet's DELTA_BINARY_PACKED and
every log-structured id column live on the same fact: an id column
sorted by itself delta-encodes to ~1 byte/row, the same column
scattered by a hash costs ~5 — a 100 TB table's layout choice is
multiple 10s of TB of storage and scan I/O.

The model is the standard zigzag varint (protobuf wire format): per
page (bucket) the first key is stored raw (8 bytes) and every
subsequent key as the zigzag-encoded delta to its predecessor IN
LAYOUT ORDER, costing ⌈bits(zigzag(Δ))/7⌉ bytes. Pages are ``ntile``
slices of the layout order — the deterministic stand-in for the
writer's row-group split (the zorder report's precedent, replayed
exactly by the SQL oracle).

Everything is integer arithmetic on exact keys: zigzag, the byte-count
thresholds (powers of 128), the sums, and the parts-per-million
savings (floor division) — hash-comparable across engines.

Scale: one window sort per layout (the sort a real rewrite would do
anyway), map-side combinable byte sums; output is |layouts| rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def zigzag(g: Column) -> Column:
    return F.when(g >= 0, 2 * g).otherwise(-2 * g - 1)


def varint_bytes(z: Column) -> Column:
    """Bytes to store non-negative z as a base-128 varint (≤ 9 for the
    62-bit range zigzag of bigint gaps occupies here)."""
    out = F.lit(9)
    for nbytes in range(8, 0, -1):
        out = F.when(z < F.lit(128 ** nbytes), F.lit(nbytes)).otherwise(out)
    return out


def delta_varint_report(
    df: DataFrame,
    key_col: str,
    layouts: dict[str, list[str]],
    n_pages: int = 64,
) -> DataFrame:
    """Per-layout storage cost of ``key_col`` under delta-varint
    encoding. ``layouts`` maps a layout name to its ordering columns
    (``key_col`` is appended as the final tiebreak so every order is
    total). NULL ordering columns sort FIRST, explicitly — a row with
    an unknown cluster key still occupies bytes, so it is counted, in
    an engine-pinned page (Spark's ASC default; an oracle must say
    NULLS FIRST to replay it). Output per layout: n_rows, total_bytes,
    fixed_bytes (8 per row), saved_ppm — exact integers."""
    outs = []
    for name, order_cols in layouts.items():
        order = [F.col(c).asc_nulls_first() for c in order_cols] + [
            F.col(key_col)
        ]
        page = F.ntile(n_pages).over(Window.orderBy(*order))
        laid = df.select(
            F.col(key_col).alias("__k"),
            *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order_cols)],
            page.alias("__page"),
        )
        in_page = Window.partitionBy("__page").orderBy(
            *[
                F.col(f"__o{i}").asc_nulls_first()
                for i in range(len(order_cols))
            ],
            F.col("__k"),
        )
        gap = F.col("__k") - F.lag("__k").over(in_page)
        cost = F.when(gap.isNull(), F.lit(8)).otherwise(
            varint_bytes(zigzag(gap))
        )
        outs.append(
            laid.withColumn("__bytes", cost)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("__bytes").alias("total_bytes"),
            )
            .select(
                F.lit(name).alias("layout"),
                "n_rows",
                "total_bytes",
                (F.col("n_rows") * 8).alias("fixed_bytes"),
                F.expr(
                    "(n_rows * 8 - total_bytes) * 1000000"
                    " div (n_rows * 8)"
                ).alias("saved_ppm"),
            )
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionAll(o)
    return result


def compaction_binpack_plan(
    files: DataFrame,
    group_col: str,
    order_col: str,
    bytes_col: str,
    target_bytes: int,
) -> DataFrame:
    """Small-files compaction plan — the MAINTENANCE member of the
    layout family (the zorder report scores clustering, the varint
    report scores encoding; this one plans the rewrite that fixes
    file-count pathology): pack each group's files, in their existing
    ``order_col`` order (preserving date/key clustering and therefore
    pruning), into output files of ``target_bytes`` by cumulative-sum
    assignment — bin = floor(bytes_before / target). Parquet rewrites
    can split a source file across outputs, so the cumulative
    assignment IS the exact plan, not an approximation, and the bin
    count per group is provably minimal (⌈Σbytes / target⌉).

    Output per group: n_files_before, n_bins_after, bytes_total,
    n_boundary_splits (source files straddling an output boundary —
    the rows a rewrite must actually cut), and fill_ppm =
    bytes_total · 1e6 / (n_bins · target) — the packedness the plan
    achieves (last bin underfill is the only slack).

    Scale: one window prefix-sum per group over the FILE MANIFEST
    (metadata-sized, never row data), one per-group fold."""
    sized = files.select(
        F.col(group_col).alias("__g"),
        F.col(order_col).alias("__o"),
        F.col(bytes_col).cast("long").alias("__b"),
    ).withColumn(
        "__before",
        F.coalesce(
            F.sum("__b").over(
                Window.partitionBy("__g")
                .orderBy("__o")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    t = F.lit(target_bytes)
    bin_first = F.floor(F.col("__before") / t)
    bin_last = F.floor((F.col("__before") + F.col("__b") - 1) / t)
    per_file = sized.select(
        "__g",
        "__b",
        (bin_last > bin_first).cast("long").alias("__split"),
    )
    agg = per_file.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files_before"),
        F.sum("__b").cast("bigint").alias("bytes_total"),
        F.sum("__split").cast("bigint").alias("n_boundary_splits"),
    )
    n_bins = F.floor(
        (F.col("bytes_total") + t - 1) / t
    ).cast("bigint")
    return agg.select(
        F.col("__g").alias(group_col),
        "n_files_before",
        n_bins.alias("n_bins_after"),
        "bytes_total",
        "n_boundary_splits",
        F.floor(
            F.col("bytes_total").cast("double")
            * F.lit(1e6)
            / (n_bins.cast("double") * t.cast("double"))
        )
        .cast("bigint")
        .alias("fill_ppm"),
    )
