"""Corpus-statistics text scoring: TF-IDF term ranking and unigram
language-model log-probability — the "statistical" tier of quality
signals, complementing the rule-based tier in
:mod:`operators.quality_rules` (charter extension, SURVEY.md §2.12; the
reference's text surface stops at sentinel cleanup, reference
README.md:371).

Single-pass shape: the corpus is tokenized and aggregated to the
per-(doc, term) ``tf`` relation ONCE, and the corpus-wide model
statistics (document frequency / token frequency) are attached with a
window over the ``term`` key instead of a groupBy + self-join — a
self-join would re-run the tokenize + aggregate lineage per consumer
(Spark only reuses exchanges for bit-identical subplans, which join
reordering breaks). The only second scan is a scalar corpus total
(count / token sum), which is a shuffle-free partial aggregate
broadcast into the plan — never a driver collect.

Shuffle budget per scorer: (doc, term) for tf → term for the model
window → doc for the final ranking/aggregation. All three are
map-side-combined or sort-window stages over the vocabulary-sized tf
relation, not the raw token stream. No Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.operators.chunking import ws_tokens


def term_frequencies(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-(document, term) whitespace-token counts — the shared input
    relation of both scorers. One explode + one hash aggregate; the
    explode streams, nothing per-doc is materialized."""
    toks = df.select(
        F.col(id_col), F.explode(ws_tokens(text_col)).alias("term")
    )
    return toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by TF-IDF
    (tf × ln(n_docs / df)).

    Ranking uses the ROUNDED (6dp) score with the term string as
    tie-break, so the top-k cut is deterministic and engine-portable:
    equal (tf, df) pairs produce bit-identical scores on any engine,
    and near-ties beyond 6dp collapse into the explicit term order.

    Document frequency is ``count(*) over (partition by term)`` on the
    tf relation; the corpus size is a broadcast one-row aggregate
    (docs with ≥1 token ≡ distinct docs in tf). The per-doc top-k is a
    ``row_number`` filter Spark plans as WindowGroupLimit — partial
    top-k before the final sort."""
    tf = term_frequencies(df, id_col, text_col)
    n_docs = (
        df.filter(F.size(ws_tokens(text_col)) > 0)
        .agg(F.count("*").alias("n_docs"))
    )
    scored = (
        tf.withColumn(
            "df", F.count("*").over(Window.partitionBy("term"))
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return scored.withColumn(
        "rk", F.row_number().over(w).cast("int")
    ).filter(F.col("rk") <= k)


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Mean per-token natural-log probability of each document under the
    corpus's own unigram model — the CCNet-style "LM quality" signal
    (there, a pretrained KenLM; here, self-trained on the corpus, which
    needs no external artifact and still separates fluent from
    gibberish/outlier documents: rare-token-heavy docs score low).

    Output: (doc_id, n_tokens, avg_logprob) with avg_logprob rounded to
    6dp — the mean of ≤ a-few-thousand ln terms divided by the count, so
    cross-engine float-sum ordering noise (≈1e-13 relative) is far below
    the rounding grain.

    Corpus token counts are ``sum(tf) over (partition by term)`` on the
    tf relation; the corpus token total is a broadcast shuffle-free
    scalar aggregate over the documents scan (Σ per-doc token counts ≡
    Σ model counts)."""
    tf = term_frequencies(df, id_col, text_col)
    total = (
        df.agg(
            F.sum(F.size(ws_tokens(text_col)))
            .cast("double")
            .alias("total")
        )
    )
    return (
        tf.withColumn(
            "cnt", F.sum("tf").over(Window.partitionBy("term"))
        )
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(
                F.sum(
                    F.col("tf")
                    * F.log(F.col("cnt").cast("double") / F.col("total"))
                )
                / F.sum("tf"),
                6,
            ).alias("avg_logprob"),
        )
    )
