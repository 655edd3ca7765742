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
    # ---- ROUND 6 WINDOW: exactly 50 entries.
    # Arithmetic: 22 promotions + 5 changed re-certifications + 2
    # rows-only→oracle upgrades + 1 rows-only re-queue = 30 new/changed;
    # 20 slots refresh green rows oldest-evidence-first (the 8-query
    # r1-evidence remainder, then the r2-evidence set in registration
    # order), per the standing rule at the bottom.
    #
    # -- (1) the twenty-two round-5-staged queries, now registered
    # (plans/staged_round6.py — full oracles, strict-mirror parity at
    # sf0.001 + sf0.01, x30 stress rows; built in r5, first driver rows
    # here).
    "dedup_keep_best_quality",
    "leakage_safe_split_assign",
    "token_budget_selection",
    "mixture_epoch_capped_plan",
    "bpe_pair_stats",
    "winnowing_cap_report",
    "incremental_embedding_new_pairs",
    "dsir_importance_weights",
    "dsir_gumbel_topk",
    "bpe_learn_merges",
    "bpe_encode_compression",
    "duplicate_span_report",
    "cut_duplicate_spans_stats",
    "soft_dedup_weights",
    "bpe_fertility_by_lang",
    "cross_source_span_leakage",
    "mattr_lexical_diversity",
    "join_null_safe_agg",
    "bigram_logprob_quality",
    "curation_v2_report",
    "sessionize_event_stats",
    "doremi_domain_reweight",
    # -- (2) changed-in-round-6 re-certifications:
    # winnowing_passage_pairs — cap_bucket_size switched from
    # whole-bucket drop to deterministic min-id retention (the ×100
    # saturation fix; oracle updated to the ROW_NUMBER retention);
    # minhash_dedup_clusters / corpus_curation_full /
    # near_dup_cluster_size_histogram — duplicate_clusters now iterates
    # to fixpoint instead of a 12-hop bound (same result at any SF
    # whose component diameter ≤ 12, but the implementation changed).
    "winnowing_passage_pairs",
    "minhash_dedup_clusters",
    "corpus_curation_full",
    "near_dup_cluster_size_histogram",
    # -- (3) rows-only → oracle-backed upgrades (the IVF-pair pattern
    # from round 5): both sketch queries now emit deterministic
    # accuracy-gate outputs (exact companions + zero-violation bound
    # verdicts) the oracle pins, so their driver rows upgrade from
    # `no_oracle` to hash.
    "approx_distinct_events",
    "approx_percentiles_sketch",
    # -- (4) rows-only re-queue: semantic_dedup_survivors depends on
    # clustering.assign_to_codebook, which grew an optional score_col
    # in round 5 after its r4 driver row; refresh the evidence.
    "semantic_dedup_survivors",
    # -- (5) oldest-evidence rotation, r1 remainder (their last driver
    # rows were produced by round-1 code; ngram_jaccard_pairs rotates in
    # from CHECK_LAST for its first refresh since r1).
    "exact_dedup_fingerprint",
    "levenshtein_similar_names",
    "ngram_jaccard_pairs",
    "scalar_date_arithmetic",
    "text_lang_id",
    "text_quality_scores",
    "text_token_stats",
    "window_distribution_funcs",
    # -- (6) oldest-evidence rotation, r2 set in registration order
    # (13 of 45; the remainder rotates in round 7+).
    "limit_offset_sample",
    "approx_distinct_error_bound",
    "approx_percentile_error_bound",
    "collect_segments_per_nation",
    "embedding_cosine_topk",
    "embedding_ivf_topk",
    "embedding_near_dup_pairs",
    "multimodal_binary_meta",
    "corpus_curation_basic",
    "text_top_pieces",
    "chunk_documents_tokens",
    "stratified_sample_per_lang",
    "mixture_upsample_by_lang",
    # ---- 50-row window boundary ----
    #
    # STANDING ROTATION RULE (policy since round 5; held in r4/r5/r6):
    # each round's window must fit new + changed + reds; cap net-new
    # registrations so that holds (new + changed + oldest-stale ≤ 50),
    # and fill every remaining slot with green rows
    # oldest-evidence-first. Never let a query sit never-checked across
    # a round boundary.
    #
    # ROUND-7 ROTATION NOTES (window arithmetic pre-planned):
    #   (a) 17 promotions from plans/staged_round7.py (all oracled,
    #       parity-tested at sf0.001+sf0.01, x30-stressed):
    #       geo_radius_pairs_customers, geo_nearest_neighbor_probes,
    #       bm25_doc_scores, rrf_quality_length_fusion,
    #       cuped_event_experiment, ewma16_user_value,
    #       quality_decile_calibration, curriculum_interleave_shards,
    #       embedding_top_direction_power, triplet_mining_anchors,
    #       mmr_diverse_rerank, annotator_agreement_kappa,
    #       item_cooccurrence_similarity, ab_purchase_ztest,
    #       ndcg_length_ranker_by_source, mann_whitney_event_value,
    #       chisq_event_type_by_arm.
    #   (b) changed-in-r6 re-certifications (the minhash verification
    #       join gained a sort-merge hint — plan-only, values
    #       unchanged, but policy recertifies): minhash_dedup_clusters,
    #       corpus_curation_full, dedup_keep_best_quality,
    #       leakage_safe_split_assign, soft_dedup_weights (+
    #       minhash_lsh_near_duplicates stays CHECK_LAST, rows-only).
    #   (c) fill the remaining ~28 slots oldest-evidence-first:
    #       continue the r2 refresh where (6) leaves off —
    #       embedding_quantize_error_bound, udtf_split_sentences,
    #       pii_redaction_counts, repetition_signals,
    #       decontaminate_ngram_overlap, pack_sequences_bins,
    #       train_val_split_hash, ... (registration order), then r3.
    #   17 + 5 + 28 = 50 holds.
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
