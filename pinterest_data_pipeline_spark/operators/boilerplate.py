"""Corpus-frequency boilerplate detection: find word n-grams that recur
across many documents (navigation chrome, license headers, template
text) and score each document by how much of it is boilerplate — the
cross-document complement of the within-document repetition signals in
``operators/text.py``.

Scale design (100 TB corpus):
- Per-document n-grams are built with pure expressions and deduplicated
  executor-side (``array_distinct``) BEFORE the explode, so the
  document-frequency aggregation's shuffle carries each (doc, gram)
  once and map-side partial aggregation collapses repeats early.
- The threshold is a FRACTION of the corpus (boilerplate = "appears in
  >= x% of documents"), so the operator means the same thing at sf0.01
  and at 100 TB; the corpus count joins in as a broadcast scalar, never
  a driver-side collect in the plan-building path.
- The frequent set is tiny by construction (corpus-wide boilerplate is
  a short head, not the long tail), so it is **broadcast** back — the
  second pass over the corpus never shuffles, it streams through a
  broadcast hash join. If the head outgrew broadcast range the same
  plan falls back to a shuffled join on the gram key; the document side
  is already distinct so the join input is minimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.operators.decontam import word_ngrams


def _doc_grams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(text_col, n))).alias("ng"),
    )


def corpus_frequent_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    min_doc_frac: float = 0.08,
) -> DataFrame:
    """Word ``n``-grams appearing in at least ``min_doc_frac`` of all
    documents, with their document frequency: (ng, doc_freq).

    The corpus size enters as a broadcast one-row aggregate (a cross
    join Catalyst turns into BroadcastNestedLoopJoin over a single
    row), keeping the whole computation one lazy plan."""
    n_docs = df.select(F.count("*").alias("__n_docs"))
    return (
        _doc_grams(df, id_col, text_col, n)
        .groupBy("ng")
        .agg(F.count("*").alias("doc_freq"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("doc_freq") >= F.col("__n_docs") * min_doc_frac)
        .select("ng", "doc_freq")
    )


def boilerplate_fraction(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    min_doc_frac: float = 0.08,
) -> DataFrame:
    """Per-document boilerplate share: the fraction of its distinct
    ``n``-grams that are corpus-frequent (doc frequency at or above
    ``min_doc_frac`` of the corpus).

    Output: (id_col, n_grams, n_frequent, boilerplate_frac) for every
    document with at least one gram. ``boilerplate_frac`` is an exact
    integer quotient rounded to 6dp, so the number is engine-portable.
    A curation funnel drops or truncates documents above a threshold."""
    grams = _doc_grams(df, id_col, text_col, n)
    frequent = corpus_frequent_ngrams(df, id_col, text_col, n, min_doc_frac)
    hits = (
        grams.join(F.broadcast(frequent.select("ng")), "ng")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_frequent"))
    )
    totals = grams.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    return totals.join(hits, id_col, "left").select(
        F.col(id_col),
        F.col("n_grams"),
        F.coalesce(F.col("n_frequent"), F.lit(0)).cast("long").alias("n_frequent"),
        F.round(
            F.coalesce(F.col("n_frequent"), F.lit(0)) / F.col("n_grams"), 6
        ).alias("boilerplate_frac"),
    )
