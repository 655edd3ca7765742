"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation set — the standard pre-training
hygiene step (drop or down-weight train docs that leak eval content).

Scale design (100 TB corpus, MB-scale benchmark):
- n-grams are built per-row with pure expressions (split → sequence →
  slice → array_join), deduplicated executor-side with
  ``array_distinct`` BEFORE the explode, so the shuffle never carries a
  document's repeated n-grams.
- The eval side of the match is tiny by construction (benchmarks are
  thousands of documents, not billions), so its distinct n-gram set is
  **broadcast** — the corpus-side scan streams through a broadcast hash
  join with zero shuffle of the training n-grams. If the eval set ever
  outgrew broadcast range, the same plan degrades gracefully to a
  hash-partitioned join on the n-gram key; a bloom-filter pre-pass
  (``spark.sql.optimizer.runtime.bloomFilter.enabled``) would keep the
  shuffled volume near the true-positive rate.
- Output is per-document match counts (one aggregation on ``doc_id``),
  never materialized pair lists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.operators.chunking import ws_tokens


def word_ngrams(text: Column | str, n: int) -> Column:
    """Array of space-joined word ``n``-grams of the whitespace tokens.

    Documents shorter than ``n`` tokens yield an empty array (guarded —
    ``sequence`` with a descending range would otherwise error under
    ANSI). 1-based ``slice`` mirrors DuckDB's ``list_slice`` so oracle
    SQL can reproduce the grams byte-for-byte."""
    toks = ws_tokens(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def ngram_contamination(
    df: DataFrame,
    eval_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
) -> DataFrame:
    """Per-training-document count of distinct word ``n``-grams shared
    with the evaluation slice (``eval_pred`` selects eval rows).

    Returns (id_col, n_shared) for contaminated documents only — a
    downstream anti-join against this frame is the "drop leaked docs"
    step. Deterministic: distinct-gram counting has no ordering
    dependence."""
    grams = df.select(
        F.col(id_col),
        eval_pred.alias("is_eval"),
        F.explode(F.array_distinct(word_ngrams(text_col, n))).alias("ng"),
    )
    eval_grams = (
        grams.filter(F.col("is_eval")).select("ng").distinct()
    )
    train_grams = grams.filter(~F.col("is_eval"))
    return (
        train_grams.join(F.broadcast(eval_grams), "ng")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
    )
