"""Stylometry: Burrows' Delta distance between corpus slices.

Burrows' Delta (Burrows 2002, "Delta: a measure of stylistic
difference") is the standard authorship-attribution / style-drift
distance: over the corpus's most frequent words, z-score each slice's
relative frequency against the across-slice distribution, and the
distance between two slices is the mean absolute z difference. Function
words dominate the top of any frequency list, so Delta reads STYLE
(how text is written) where the topical surfaces (TF-IDF, unigram KL —
`unigram_kl_by_source`) read CONTENT. In a training-data pipeline it
answers "did source X's writing style drift this month" and "which
scraped sources are stylistic near-clones" — near-clone sources are
candidate duplicates at the PROVIDER level, upstream of any per-doc
dedup.

Reference parity: no reference analog (the reference engine has no text
analytics; README.md:1-60 scopes it to posting-event pipelines); this
extends the corpus-linguistics family (collocations.py, readability.py).

Exactness discipline: relative frequencies enter as FLOOR(1e9·cnt/total)
integer ppb, the z-score moments are integer sums over the FIXED slice
set (Σppb ≤ S·1e9, Σppb² ≤ S·1e18 — exact bigints for S ≤ 9 slices),
z and |Δz| are fixed double trees, and the across-token mean is an
ORDERED cumulative window sum (token ascending) read at its last row —
the Kaplan-Meier ordered-fold pattern — so no unordered double
accumulation exists and a DuckDB oracle replays every value
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def burrows_delta(
    docs: DataFrame,
    text_col: str,
    slice_col: str,
    top_slices: int = 6,
    top_tokens: int = 20,
) -> DataFrame:
    """Pairwise Burrows' Delta over the ``top_slices`` largest slices
    (by document count, ties by name) and the ``top_tokens`` most
    frequent alphabetic tokens across those slices (ties by token).
    Returns one row per unordered slice pair: (slice_a, slice_b,
    n_tokens, delta_r6), slice_a < slice_b, ordered by pair.

    Scale: one tokenize-and-count shuffle on (slice, token); the
    slice census, token top-k, and 6×20 frequency spine are
    metadata-sized broadcasts; the pair stage runs on the
    |slices|·|tokens| z relation (≤ 180 rows at the defaults) — the
    corpus is scanned exactly once however large it is."""
    toks = docs.select(
        F.col(slice_col).cast("string").alias("__s"),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit("[a-z]+"), 0
            )
        ).alias("__w"),
    )
    slice_census = docs.groupBy(
        F.col(slice_col).cast("string").alias("__s")
    ).agg(F.count(F.lit(1)).alias("__docs"))
    keep_slices = F.broadcast(
        slice_census.orderBy(F.col("__docs").desc(), F.col("__s").asc())
        .limit(top_slices)
        .select("__s")
    )
    kept = toks.join(keep_slices, "__s")
    # ONE corpus tokenize pass: totals, the token top-k, and the ppb
    # spine all branch off this vocabulary-sized relation, so without
    # the materialization Catalyst would replay the explode-and-count
    # shuffle once per branch (and once more per side of the z pair
    # join) — the semantic_dedup localCheckpoint discipline.
    counts = kept.groupBy("__s", "__w").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    ).localCheckpoint(eager=False)
    totals = counts.groupBy("__s").agg(F.sum("__c").alias("__tot"))
    top_w = F.broadcast(
        counts.groupBy("__w")
        .agg(F.sum("__c").alias("__g"))
        .orderBy(F.col("__g").desc(), F.col("__w").asc())
        .limit(top_tokens)
        .select("__w")
    )
    # dense (slice × token) spine so absent tokens contribute ppb = 0
    spine = keep_slices.crossJoin(top_w)
    ppb = (
        spine.join(counts, ["__s", "__w"], "left")
        .join(F.broadcast(totals), "__s")
        .select(
            "__s",
            "__w",
            F.expr("(coalesce(__c, 0) * 1000000000) div __tot")
            .cast("bigint")
            .alias("__ppb"),
        )
    )
    moments = ppb.groupBy("__w").agg(
        F.count(F.lit(1)).cast("bigint").alias("__ns"),
        F.sum("__ppb").alias("__s1"),
        F.sum(F.col("__ppb") * F.col("__ppb")).alias("__s2"),
    )
    nsd = F.col("__ns").cast("double")
    mu = F.col("__s1").cast("double") / nsd
    var = (
        F.col("__s2").cast("double")
        - F.col("__s1").cast("double") * F.col("__s1").cast("double") / nsd
    ) / nsd
    # |slices|·|tokens| rows (≤ 180 at the defaults): materialize so
    # BOTH sides of the pair join read it instead of replaying the
    # corpus pipeline once per side
    z = (
        ppb.join(F.broadcast(moments), "__w")
        .select(
            "__s",
            "__w",
            F.when(
                var > 0,
                (F.col("__ppb").cast("double") - mu) / F.sqrt(var),
            )
            .otherwise(F.lit(0.0))
            .alias("__z"),
        )
        .localCheckpoint(eager=False)
    )
    za = z.select(
        F.col("__s").alias("slice_a"),
        "__w",
        F.col("__z").alias("__za"),
    )
    zb = z.select(
        F.col("__s").alias("slice_b"),
        "__w",
        F.col("__z").alias("__zb"),
    )
    pair_terms = za.join(F.broadcast(zb), "__w").where(
        F.col("slice_a") < F.col("slice_b")
    )
    # ordered fold: cumulative |Δz| sum token-ascending, read at the
    # last token — identical accumulation order in both engines
    wcum = (
        Window.partitionBy("slice_a", "slice_b")
        .orderBy("__w")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = pair_terms.select(
        "slice_a",
        "slice_b",
        "__w",
        F.sum(F.abs(F.col("__za") - F.col("__zb"))).over(wcum).alias("__cum"),
    )
    return (
        cum.groupBy("slice_a", "slice_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.max_by("__cum", "__w").alias("__total"),
        )
        .select(
            "slice_a",
            "slice_b",
            "n_tokens",
            F.round(
                F.col("__total") / F.col("n_tokens").cast("double"), 6
            ).alias("delta_r6"),
        )
        .orderBy("slice_a", "slice_b")
    )
