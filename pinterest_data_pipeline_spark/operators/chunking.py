"""Document chunking for training-data pipelines: fixed token-window
chunks with overlap — the step between a curated corpus and a tokenizer.

Scale design: chunking is a pure per-row expression pipeline (split →
sequence of window starts → slice per start → explode). No shuffle, no
UDF, whole-stage codegen end to end; output row count is
Σ ceil(doc_tokens / step), which the explode streams without
materializing per-doc chunk arrays in driver memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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


def pack_sequences(
    df: DataFrame,
    part_col: str = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 2048,
) -> DataFrame:
    """Concat-and-chunk sequence packing: assign each document to a
    fixed-token-budget training bin.

    Documents are laid end-to-end in ``order_col`` order within each
    ``part_col`` stream; a document's bin is the budget-window its first
    token falls in (``floor(prefix_tokens / budget)``). This is the
    standard streaming "concatenate then split every *budget* tokens"
    packing — deterministic, one pass, and exactly reproducible in ANSI
    SQL (unlike first-fit-decreasing, whose bin state is sequential).

    Scale: one shuffle on ``part_col`` for the running-sum window. A
    skewed stream (one giant language) serializes its window into a
    single task; at 100 TB the fix is a composite stream key — e.g.
    ``(lang, doc_id bucket)`` so each bucket packs independently —
    which this function supports by passing a pre-built composite column
    name as ``part_col``.

    Output: per (part_col, bin_id) — documents assigned and their token
    total. ``total_tokens`` may overshoot ``budget`` by up to one
    document (the straddler keeps its starting bin)."""
    n_tok = F.size(ws_tokens(text_col)).cast("long").alias("n_tok")
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum("n_tok").over(w), F.lit(0).cast("long"))
    return (
        df.select(part_col, order_col, n_tok)
        .withColumn("bin_id", F.floor(prev / F.lit(budget)))
        .groupBy(part_col, "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
        )
    )
