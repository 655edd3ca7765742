"""Semantic deduplication over an embedding column (SemDeDup-style).

Pipeline: k-means codebook partitions the corpus into semantic clusters,
then near-duplicate pairs are searched ONLY within each cluster (cosine ≥
threshold), and of every duplicate pair the higher-id row is dropped
(keep-lowest-id survivor, the same deterministic rule the exact/MinHash
dedup operators use).

Scale design (100 TB): the all-pairs search is confined to k-means cells,
so the candidate join shuffles on ``cluster`` and its cost is
Σ|cell|² rather than n². The codebook itself is driver-side metadata
(k×dim floats, broadcast into the plan as literals); training cost is
``iterations`` linear scans. For very large corpora, raise ``k`` so the
expected cell size stays bounded (cells ≈ n/k) — the same knob IVF search
uses (`operators/similarity.py`). Reference parity: the reference engine
has no embedding-space dedup; this extends its dedup family
(README.md:339-592 exact/fuzzy dedup) to the embedding modality, per the
SemDeDup recipe (Abbas et al., 2023, arXiv:2303.09540 — public paper).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.operators.clustering import (
    assign_to_codebook,
    kmeans_codebook,
)
from pinterest_data_pipeline_spark.operators.similarity import (
    embedding_near_duplicates,
)


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int | None = 16,
    threshold: float = 0.97,
    iterations: int = 2,
    target_cell_size: int = 600,
) -> DataFrame:
    """Drop rows whose embedding has a cosine-``threshold`` duplicate with
    a lower id in the same semantic cluster. Returns the surviving rows
    (original schema plus ``cluster``).

    ``k=None`` auto-scales the codebook so expected cell size stays
    ``target_cell_size``: the within-cell pair search costs Σ|cell|², so
    a FIXED k degrades quadratically as the corpus grows (measured: 20×
    wall at 30× rows with k=8, PERF.md ×30 table) while k ∝ n holds the
    per-cell work constant and the total at O(n · target_cell_size).
    That one count() scan is the price of a plan that survives scale-up.

    Deterministic end to end: codebook init/iterations are fixed
    (`kmeans_codebook`), survivor choice is min-id.
    """
    from pinterest_data_pipeline_spark.operators.parallel import fan_out

    # fan out BEFORE the assignment projection: the k×dim argmin must not
    # run inside a single-task scan stage (operators/parallel)
    df = fan_out(df)
    if k is None:
        k = max(8, df.count() // target_cell_size)
    centroids = kmeans_codebook(
        df, vec_col=vec_col, id_col=id_col, k=k, iterations=iterations
    )
    assigned = assign_to_codebook(df, centroids, vec_col=vec_col)
    pairs = embedding_near_duplicates(
        assigned,
        id_col=id_col,
        vec_col=vec_col,
        threshold=threshold,
        partition_col="cluster",
    )
    removed = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return assigned.join(removed, on=id_col, how="left_anti")


def semantic_dedup_summary(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int | None = 16,
    threshold: float = 0.97,
) -> DataFrame:
    """One-row summary of a semantic-dedup pass: total / removed /
    surviving row counts plus an id checksum of the survivors (stable
    across runs — pins determinism for the rows-only driver check)."""
    survivors = semantic_dedup(
        df, id_col=id_col, vec_col=vec_col, k=k, threshold=threshold
    )
    total = df.count()
    return survivors.agg(
        F.lit(total).cast("bigint").alias("n_total"),
        (F.lit(total) - F.count("*")).cast("bigint").alias("n_removed"),
        F.count("*").cast("bigint").alias("n_survivors"),
        F.sum(id_col).cast("bigint").alias("survivor_id_sum"),
    )
