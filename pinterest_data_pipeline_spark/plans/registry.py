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
    # ---- ROUND 7 WINDOW: exactly 50 entries.
    # Arithmetic: 17 promotions + 5 changed re-certifications + 1
    # rows-only→oracle upgrade = 23 new/changed; 27 slots refresh green
    # rows oldest-evidence-first (the r2-evidence set in registration
    # order, continuing where round 6's rotation left off), per the
    # standing rule at the bottom.
    #
    # -- (1) the seventeen round-6-staged queries, now registered
    # (plans/staged_round7.py — full oracles, strict-mirror parity at
    # sf0.001 + sf0.01, x30 stress rows; built in r6, first driver rows
    # here). Spatial grid joins over the reference's geo.coordinates
    # surface, retrieval ranking, experimentation statistics, spectral
    # power iteration, labeling QA.
    "geo_radius_pairs_customers",
    "geo_nearest_neighbor_probes",
    "bm25_doc_scores",
    "rrf_quality_length_fusion",
    "cuped_event_experiment",
    "ewma16_user_value",
    "quality_decile_calibration",
    "curriculum_interleave_shards",
    "embedding_top_direction_power",
    "triplet_mining_anchors",
    "mmr_diverse_rerank",
    "annotator_agreement_kappa",
    "item_cooccurrence_similarity",
    "ab_purchase_ztest",
    "ndcg_length_ranker_by_source",
    "mann_whitney_event_value",
    "chisq_event_type_by_arm",
    # -- (2) changed-in-round-6 re-certifications: commit 3d62ac7 added
    # a sort-merge hint to the minhash verification join (plan-only,
    # values unchanged, but policy recertifies every query whose
    # physical plan input changed). minhash_lsh_near_duplicates shares
    # the code path but stays CHECK_LAST (rows-only by design).
    "minhash_dedup_clusters",
    "corpus_curation_full",
    "dedup_keep_best_quality",
    "leakage_safe_split_assign",
    "soft_dedup_weights",
    # -- (3) rows-only → oracle-backed upgrade (the IVF-pair pattern):
    # semantic_dedup_survivors now emits deterministic survivor-count /
    # survivor-checksum / cell-invariant outputs pinned by a DuckDB
    # replay of the fixed-codebook assignment.
    "semantic_dedup_survivors",
    # -- (4) oldest-evidence rotation: the r2-evidence set in
    # registration order (27 of 32; the 5-query remainder —
    # scd2_segment_changes, agg_percentiles, agg_stats_exact,
    # scalar_subquery_low_qty, range_join_acctbal_bands — rotates in
    # round 8).
    "embedding_quantize_error_bound",
    "udtf_split_sentences",
    "pii_redaction_counts",
    "repetition_signals",
    "decontaminate_ngram_overlap",
    "pack_sequences_bins",
    "train_val_split_hash",
    "gopher_quality_flags",
    "boilerplate_ngram_fraction",
    "decontaminate_jaccard_overlap",
    "deterministic_shuffle_shards",
    "tfidf_top_terms",
    "unigram_logprob_quality",
    "tumbling_hourly_event_counts",
    "sliding_window_event_counts",
    "session_window_user_counts",
    "stream_interval_join_batch",
    "stream_running_totals_batch",
    "stream_static_enrich_batch",
    "asof_join_latest_view",
    "pandas_udf_bucket_counts",
    "grouped_map_top2_per_nation",
    "explode_type_words",
    "map_column_access",
    "sql_revenue_topk",
    "event_funnel_steps",
    "merge_upsert_customers",
    # ---- 50-row window boundary ----
    #
    # STANDING ROTATION RULE (policy since round 5; held r4→r7):
    # each round's window must fit new + changed + reds; cap net-new
    # registrations so that holds (new + changed + oldest-stale ≤ 50),
    # and fill every remaining slot with green rows
    # oldest-evidence-first. Never let a query sit never-checked across
    # a round boundary.
    #
    # ROUND-8 ROTATION NOTES (window arithmetic pre-planned):
    #   (a) 8 promotions from plans/staged_round8.py (all oracled,
    #       parity-tested at sf0.001+sf0.01, x30-stressed):
    #       quantile_lift_user_spend, ips_reranker_policy_value,
    #       ece_quality_gate_probability, winsorized_mean_lift_user_spend,
    #       dr_reranker_policy_value, mde_power_purchase,
    #       hits_supplier_part_scores, countmin_token_frequency.
    #   (b) changed-in-r7 re-certifications: none known at plan time —
    #       the r7 advisor fixes (CUPED/kappa/NDCG NULL guards,
    #       cooccurrence/HITS broadcast removal, triplet id contract)
    #       all land INSIDE the r7 window's own promotions, so they
    #       earn their first driver rows already guarded. Queue any
    #       query whose code changes during round 7 here.
    #   (c) fill the remaining ~42 slots oldest-evidence-first: the
    #       5-query r2 remainder (scd2_segment_changes, agg_percentiles,
    #       agg_stats_exact, scalar_subquery_low_qty,
    #       range_join_acctbal_bands), then the 37-query r3-evidence
    #       set in registration order.
    #   8 + 5 + 37 = 50 holds exactly.
    #
    # ROUND-9 ROTATION NOTES (one further window, sketched):
    #   (a) 12 promotions from plans/staged_round9.py (all oracled,
    #       parity-tested, x30-stressed, plan-pinned):
    #       weighted_priority_sample, flesch_reading_ease_by_lang,
    #       charset_script_profile, benford_price_audit,
    #       ks_exact_two_sample, autocorr_daily_revenue,
    #       gini_user_activity_skew, pmi_bigram_collocations,
    #       feature_hash_buckets, stratified_budget_allocation,
    #       kaplan_meier_retention, rbo_rank_agreement.
    #   (b) changed-in-r8 re-certifications: queue as they happen.
    #   (c) fill the remaining ~38 slots oldest-evidence-first: the
    #       44-query r4-evidence set in registration order
    #       (bilateral_trade_volume ... crosstab_type_value_band); the
    #       6-query remainder + the r5 set roll to round 10, where the
    #       8 staged_round10 promotions (k_anonymity_docs,
    #       rfm_user_segments, markov_path_logloss,
    #       phrase_query_table_hash, average_precision_by_source,
    #       pq_codebook_train_gate, dow_seasonality_events,
    #       cusum_changepoint_revenue) join them.
    #   12 + 38 = 50 holds.
]

CHECK_LAST: list[str] = [
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


def has_sql_line_comment(sql: str) -> bool:
    """True if ``sql`` contains a `--` line comment OUTSIDE string
    literals. A `--` inside a quoted literal (LIKE '%--%', a regex
    class with a literal double dash) is legitimate SQL; only a bare
    `--` would be swallowed by the whitespace collapse in register()."""
    import re

    # '' inside a literal is SQL's escaped quote; consume it within the
    # literal so "it''s--x" doesn't end the literal early.
    stripped = re.sub(r"'(?:[^']|'')*'", "''", sql)
    return "--" in stripped


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and its oracle SQL, if expressible)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        # validate BEFORE inserting: a rejected registration must leave
        # no partial entry behind
        if oracle is not None and has_sql_line_comment(oracle):
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
