"""Semantic deduplication over an embedding column (SemDeDup-style).

Pipeline: k-means codebook partitions the corpus into semantic clusters,
then near-duplicate pairs are searched ONLY within each cluster (cosine ≥
threshold), and of every duplicate pair the higher-id row is dropped
(keep-lowest-id survivor, the same deterministic rule the exact/MinHash
dedup operators use).

Scale design (100 TB): the pair search is confined to k-means cells, so
the candidate join shuffles on ``cluster`` and its cost is Σ|cell|²
rather than n². The codebook itself is driver-side metadata (k×dim
floats, broadcast into the plan as literals) and is BOUNDED by ``max_k``
— k ∝ n would make the broadcast grow with the corpus. Once the bound
makes cells outgrow ``target_cell_size``, the within-cell search
switches from (block-decomposed) all-pairs to hyperplane LSH scoped per
cell, keeping cost on the bucket histogram instead of Σ|cell|². Reference parity: the reference engine
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
    max_k: int = 4096,
    within_cell: str = "auto",
    all_pairs_cell_cap: int = 1200,
    n_blocks: int = 8,
) -> DataFrame:
    """Drop rows whose embedding has a cosine-``threshold`` duplicate with
    a lower id in the same semantic cluster. Returns the surviving rows
    (original schema plus ``cluster``).

    ``k=None`` auto-scales the codebook toward expected cell size
    ``target_cell_size`` — but **bounded by ``max_k``**: an unbounded
    k ∝ n means the broadcast centroid table and the n×k assignment both
    grow linearly with the corpus (at 100 TB, n/600 centroids is
    billions — infeasible as driver metadata). With the bound, the
    codebook is at most ``max_k × dim`` doubles (4096×64 ≈ 2 MB
    broadcast; even 65536 is ~33 MB) and assignment stays O(n · max_k).

    Past the bound, cells necessarily outgrow ``target_cell_size``, so
    the within-cell pair search switches strategy (``within_cell``):

    - ``"all_pairs"`` — exact, block-decomposed over ``n_blocks`` so a
      cell's triangle spreads across tasks (embedding_near_duplicates);
      cost Σ|cell|², only sane while cells stay ≤ ``all_pairs_cell_cap``.
    - ``"lsh"`` — banded hyperplane LSH scoped to (cluster, band, key)
      buckets + exact cosine verification: cost follows the bucket
      histogram, not |cell|². At SemDeDup-grade thresholds (≥ 0.95) the
      s-curve recall is ≈ 0.99 with 6 bands × 8 planes; this is the
      100 TB path.
    - ``"auto"`` (default) — all_pairs while n/k ≤ ``all_pairs_cell_cap``,
      else lsh. Deterministic: the switch depends only on row count.

    Deterministic end to end: codebook init/iterations are fixed
    (`kmeans_codebook`), hyperplanes are seeded constants, survivor
    choice is min-id.
    """
    from pinterest_data_pipeline_spark.operators.parallel import fan_out
    from pinterest_data_pipeline_spark.operators.similarity import (
        lsh_near_duplicates,
    )

    # fan out BEFORE the assignment projection: the k×dim argmin must not
    # run inside a single-task scan stage (operators/parallel)
    df = fan_out(df)
    n = df.count()
    if k is None:
        k = max(8, min(max_k, n // target_cell_size))
    centroids = kmeans_codebook(
        df, vec_col=vec_col, id_col=id_col, k=k, iterations=iterations
    )
    assigned = assign_to_codebook(df, centroids, vec_col=vec_col)
    method = within_cell
    if method == "auto":
        method = "all_pairs" if n / k <= all_pairs_cell_cap else "lsh"
    if method == "all_pairs":
        pairs = embedding_near_duplicates(
            assigned,
            id_col=id_col,
            vec_col=vec_col,
            threshold=threshold,
            partition_col="cluster",
            n_blocks=n_blocks,
        )
    elif method == "lsh":
        pairs = lsh_near_duplicates(
            assigned,
            id_col=id_col,
            vec_col=vec_col,
            threshold=threshold,
            bands=6,
            planes_per_band=8,
            partition_col="cluster",
        )
    else:
        raise ValueError(f"unknown within_cell method: {within_cell!r}")
    removed = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return assigned.join(removed, on=id_col, how="left_anti")


def semantic_dedup_summary(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int | None = 16,
    threshold: float = 0.97,
    **kwargs,
) -> DataFrame:
    """One-row summary of a semantic-dedup pass: total / removed /
    surviving row counts plus an id checksum of the survivors (stable
    across runs — pins determinism for the rows-only driver check).
    Extra kwargs (max_k, within_cell, …) pass through to
    :func:`semantic_dedup`."""
    survivors = semantic_dedup(
        df, id_col=id_col, vec_col=vec_col, k=k, threshold=threshold, **kwargs
    )
    total = df.count()
    return survivors.agg(
        F.lit(total).cast("bigint").alias("n_total"),
        (F.lit(total) - F.count("*")).cast("bigint").alias("n_removed"),
        F.count("*").cast("bigint").alias("n_survivors"),
        F.sum(id_col).cast("bigint").alias("survivor_id_sum"),
    )
