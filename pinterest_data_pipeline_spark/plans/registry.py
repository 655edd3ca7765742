"""Registry mapping query names → (Spark plan builder, DuckDB oracle SQL).

Every operator the engine claims is registered here with:
- a PySpark builder ``(spark, sf_dir) -> DataFrame``
- optionally, an equivalent ANSI-SQL string the DuckDB oracle runs on the
  same parquet tables (omitted only for genuinely non-SQL-expressible ops,
  which the driver then checks rows-only).

Column names are aliased identically on both sides: the driver's comparator
sorts columns by name before value-hashing, so any alias drift is a fail
even when values match.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

# The external driver verifies a fixed-size PREFIX of ``queries()``:
# CORRECTNESS_r01.json contains exactly the first 50 entries in insertion
# order (cumulative sweep time at the cut was ~32 s of a 66 s total, so the
# cut is a count cap, not a time budget). With more than 50 registered
# queries the prefix must therefore be CHOSEN, not incidental:
#
# - ``CHECK_FIRST`` leads the ordering — queries with no driver row yet,
#   queries whose implementation changed since their last green row, and
#   new queries. Within it, oracle-backed (strong-signal) entries come
#   before rows-only ones.
# - Everything else follows in registration order (flagship q* queries and
#   the core relational surface first), keeping its prior-round green rows
#   as standing evidence.
# - ``CHECK_LAST`` holds heavy pair-generating queries that are already
#   green, so they never crowd out an unverified query.
#
# Rotating this list per round gives every registered query a driver
# correctness row across rounds even though each single round checks at
# most 50.
CHECK_FIRST: list[str] = [
    # ---- ROUND 4 WINDOW: exactly 50 entries, chosen so that after this
    # round EVERY registered query has at least one driver row
    # (36 never-checked + 12 round-3 reds + 2 changed-module refreshes,
    # with bucketed_colocated_join counted once in both the red-fix and
    # never-checked sets). Registry growth is FROZEN this round so the
    # arithmetic holds.
    #
    # -- (1) the 13 HUGEINT-oracle fixes: round 3's 12 hash-fail rows
    # plus the latent 13th (bucketed_colocated_join, never checked).
    # Root cause was oracle-side only — DuckDB SUM(BIGINT) → HUGEINT →
    # fetchdf float64 → dtype-sensitive driver hash mismatch vs Spark's
    # int64. All now CAST(... AS BIGINT) at the outermost select and
    # verified dtype-strictly at sf0.01 (tests/oracle_utils.py).
    "bilateral_trade_volume",
    "local_supplier_volume",
    "rolling_1h_user_value",
    "event_transition_matrix",
    "gap_fill_hourly_user_value",
    "cumulative_unique_users",
    "zonemap_prefilter_join",
    "histogram_acctbal_width_bucket",
    "key_skew_profile_events",
    "per_source_lang_mix",
    "group_by_all_sql",
    "pivot_multi_value",
    "bucketed_colocated_join",
    # -- (2) the 30 oracle-backed never-checked queries, in prior
    # registration order (ngram_containment_pairs was explicitly queued
    # first in round 3).
    "ngram_containment_pairs",
    "dedup_rate_by_source",
    "reservoir_sample_per_source",
    "quality_quartiles_by_lang",
    "near_dup_cluster_size_histogram",
    "split_distribution_drift",
    "packing_efficiency_report",
    "length_zipf_slope",
    "corr_cov_value_hour",
    "crosstab_type_value_band",
    "near_dup_triangle_count",
    "passage_dedup_report",
    "token_entropy_by_lang",
    "unigram_kl_by_source",
    "bloom_semi_join_prune",
    "cdc_chunk_dedup_report",
    "cross_source_containment",
    "salted_topk_events_per_user",
    "order_count_histogram",
    "big_order_customers",
    "part_revenue_share_gate",
    "dormant_rich_customers",
    "set_except_all_multiset",
    "set_intersect_all_multiset",
    "weighted_sample_per_source",
    "semantic_dedup_survivors",
    "corpus_curation_full",
    "embedding_lsh_near_duplicates",
    "incremental_minhash_new_pairs",
    "multimodal_raw_decode_features",
    # -- (3) changed-module refreshes (operators/skew.py switched to a
    # deterministic salt this round per the advisor finding; their r1
    # green rows refresh with the new implementation).
    "salted_agg_events",
    "salted_join_orders_customer",
    # -- (4) the 5 rows-only never-checked entries close the window —
    # weaker signal (no oracle), but each gets its first driver row,
    # including the documented-nondeterministic argmax literal form.
    "python_datasource_clean_pins",
    "multimodal_decode_features",
    "ivf_kmeans_codebook_assign",
    "embedding_ivf_multiprobe_topk",
    "argmax_literal_max_first",
    # ---- 50-row window boundary ----
    #
    # ROUND-5 ROTATION NOTES (for the next window):
    # - Promote plans/staged_round5.py (decontaminate_embedding_cosine,
    #   quality_linear_gate, winnowing_passage_pairs — full oracles,
    #   strict-mirror green at sf0.001+sf0.01, x30-measured) to the head;
    #   the promotion recipe is in that module's docstring.
    # - operators/dedup.py changed in round 4 by PURE ADDITION (the
    #   winnowing functions were appended; no existing function was
    #   touched) and its registered dependents (exact_dedup_fingerprint,
    #   ngram_jaccard_pairs, simhash_near_pairs, minhash_dedup_clusters)
    #   were re-verified green under a stock session — no re-queue
    #   obligation beyond normal rotation.
    # - After round 4 closes the backlog, rotate long-green rows oldest
    #   first into the remaining slots.
]

CHECK_LAST: list[str] = [
    "ngram_jaccard_pairs",
    "minhash_lsh_near_duplicates",
]


def ordered_queries() -> dict[str, QueryFn]:
    """All registered queries, in driver-check priority order (see above)."""
    ordered: dict[str, QueryFn] = {}
    for name in CHECK_FIRST:
        if name in QUERIES:
            ordered[name] = QUERIES[name]
    for name in QUERIES:
        if name not in ordered and name not in CHECK_LAST:
            ordered[name] = QUERIES[name]
    for name in CHECK_LAST:
        if name in QUERIES:
            ordered[name] = QUERIES[name]
    return ordered


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and its oracle SQL, if expressible)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        # validate BEFORE inserting: a rejected registration must leave
        # no partial entry behind
        if oracle is not None and "--" in oracle:
            # whitespace collapse below strips newlines, so a `--`
            # line comment would swallow the rest of the statement
            raise ValueError(
                f"oracle for {name} contains a `--` SQL comment; "
                "explain in a Python comment instead"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = " ".join(oracle.split())
        return fn

    return deco
