"""Document chunking for training-data pipelines: fixed token-window
chunks with overlap — the step between a curated corpus and a tokenizer.

Scale design: chunking is a pure per-row expression pipeline (split →
sequence of window starts → slice per start → explode). No shuffle, no
UDF, whole-stage codegen end to end; output row count is
Σ ceil(doc_tokens / step), which the explode streams without
materializing per-doc chunk arrays in driver memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ws_tokens(text: Column | str) -> Column:
    """Whitespace tokens with empties removed — identical semantics to
    DuckDB's list_filter(string_split_regex(...)) so chunk boundaries are
    oracle-checkable cross-engine."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Explode each document into overlapping token windows.

    Window starts advance by ``chunk_size - overlap`` tokens; every token
    belongs to at least one chunk and the last window may be short.
    Output: (doc_id, chunk_id, n_tokens, chunk_text), empty documents
    contribute no chunks."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    step = chunk_size - overlap
    toks = ws_tokens(text_col)
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(step)
    )
    chunks = F.transform(
        starts,
        lambda s, i: F.struct(
            i.alias("chunk_id"),
            F.slice(toks, s + 1, chunk_size).alias("toks"),
        ),
    )
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(chunks).alias("c"),
        )
        .select(
            "doc_id",
            F.col("c.chunk_id").alias("chunk_id"),
            F.size("c.toks").alias("n_tokens"),
            F.concat_ws(" ", F.col("c.toks")).alias("chunk_text"),
        )
        .filter(F.col("n_tokens") > 0)
    )
