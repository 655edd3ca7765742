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
    # ---- ROUND 9 WINDOW: exactly 50 entries.
    # Arithmetic (pre-planned in round 8's ROTATION NOTES, adjusted by
    # one changed-code slot): 12 staged_round9 promotions; 1 changed
    # re-certification (incremental_embedding_persisted_pairs, reshaped
    # to a realistic 1% increment:state ratio per the r8 verdict);
    # 5 slots re-certify the r3-evidence remainder; 32 slots refresh
    # green rows oldest-evidence-first (the r4-evidence set in
    # registration order, first 32 of 42 — the 10-query remainder
    # rolls to round 10).
    #
    # -- (1) the twelve round-8-staged queries, now registered
    # (plans/staged_round9.py — full oracles, strict-mirror parity at
    # sf0.001 + sf0.01, x30 stress rows, pre-pinned plan shapes; built
    # in r8, first driver rows here). The DATA-AUDIT +
    # CORPUS-LINGUISTICS layer: forensic numeric audits (Benford,
    # exact-KS drift, autocorrelation, Gini key-skew), collocations /
    # readability / charset / feature-hash corpus surfaces, weighted
    # priority sampling + largest-remainder allocation, Kaplan-Meier
    # retention, and rank-biased overlap. benford_price_audit and
    # autocorr_daily_revenue carry the r8 advisor fixes (cents >= 1
    # filter; exact integer-cents moments), so their first rows double
    # as fix certifications.
    "weighted_priority_sample",
    "flesch_reading_ease_by_lang",
    "charset_script_profile",
    "benford_price_audit",
    "ks_exact_two_sample",
    "autocorr_daily_revenue",
    "gini_user_activity_skew",
    "pmi_bigram_collocations",
    "feature_hash_buckets",
    "stratified_budget_allocation",
    "kaplan_meier_retention",
    "rbo_rank_agreement",
    # -- (2) changed-code re-certification (r8 verdict items 2+3): the
    # persisted-band-table ingest now measures a ~1% increment against
    # a 99% state table (vec_id % 100 == 0 split) with the one-time
    # state write moved to a prepare step, so the driver row times the
    # O(increment + state-scan) claim, not a corpus-dominated ingest.
    "incremental_embedding_persisted_pairs",
    # -- (3) r3-evidence remainder (the 5 rows round 8's rotation could
    # not fit), completing the r3 set's refresh.
    "hof_array_ops",
    "hof_map_ops",
    "parse_url_features",
    "regex_function_matrix",
    "from_csv_embedded_records",
    # -- (4) oldest-evidence rotation: the r4-evidence set in
    # registration order (32 of 42; the 10-query remainder —
    # bloom_semi_join_prune, bucketed_colocated_join,
    # rolling_1h_user_value, event_transition_matrix,
    # gap_fill_hourly_user_value, cumulative_unique_users,
    # histogram_acctbal_width_bucket, per_source_lang_mix,
    # corr_cov_value_hour, crosstab_type_value_band — rotates in
    # round 10).
    "bilateral_trade_volume",
    "local_supplier_volume",
    "order_count_histogram",
    "big_order_customers",
    "part_revenue_share_gate",
    "dormant_rich_customers",
    "pivot_multi_value",
    "salted_topk_events_per_user",
    "set_except_all_multiset",
    "set_intersect_all_multiset",
    "ngram_containment_pairs",
    "multimodal_decode_features",
    "multimodal_raw_decode_features",
    "embedding_lsh_near_duplicates",
    "incremental_minhash_new_pairs",
    "dedup_rate_by_source",
    "reservoir_sample_per_source",
    "quality_quartiles_by_lang",
    "split_distribution_drift",
    "packing_efficiency_report",
    "length_zipf_slope",
    "near_dup_triangle_count",
    "passage_dedup_report",
    "token_entropy_by_lang",
    "unigram_kl_by_source",
    "cdc_chunk_dedup_report",
    "cross_source_containment",
    "weighted_sample_per_source",
    "salted_agg_events",
    "salted_join_orders_customer",
    "zonemap_prefilter_join",
    "group_by_all_sql",
    # ---- 50-row window boundary ----
    #
    # STANDING ROTATION RULE (policy since round 5; held r4→r8):
    # each round's window must fit new + changed + reds; cap net-new
    # registrations so that holds (new + changed + oldest-stale ≤ 50),
    # and fill every remaining slot with green rows
    # oldest-evidence-first. Never let a query sit never-checked across
    # a round boundary.
    #
    # ROUND-10 ROTATION NOTES (window arithmetic pre-planned):
    #   (a) 8 promotions from plans/staged_round10.py (all oracled,
    #       parity-tested, x30-stressed):
    #       k_anonymity_docs, rfm_user_segments, markov_path_logloss,
    #       phrase_query_table_hash, average_precision_by_source,
    #       pq_codebook_train_gate, dow_seasonality_events,
    #       cusum_changepoint_revenue.
    #   (b) changed-in-r9 re-certifications: queue as they happen.
    #   (c) fill the remaining ~42 slots oldest-evidence-first: the
    #       10-query r4-evidence remainder (bloom_semi_join_prune ...
    #       crosstab_type_value_band), then the r5-evidence set in
    #       registration order — 32 fit; the rest roll to round 11,
    #       where the 10 staged_round11 promotions join them.
    #   8 + 10 + 32 = 50 holds exactly.
    #
    # FURTHER STAGED INVENTORY (keeping every window promotion-only):
    #   round 11: plans/staged_round11.py, 10 queries (4 exact-
    #     similarity-join seed + 6 pipeline-operations added in r8);
    #   round 12: plans/staged_round12.py, 8 queries (bootstrap CI,
    #     OBF interim looks, span-corruption plan, profile drift,
    #     mutual NN, DB cell quality, LPA communities, Fellegi-Sunter
    #     link weights);
    #   round 13: plans/staged_round13.py, 10 queries (5-query seed +
    #     the round-9 extension: survivorship golden record,
    #     Good-Turing coverage, KMV distinct sketch, Fano burstiness,
    #     SRM assignment audit);
    #   round 14: plans/staged_round14.py, 8 queries (built in r9:
    #     SNM blocking recall, degree assortativity, Heaps vocab
    #     growth, idempotency conflict audit, revenue proration,
    #     quantile normalization, TWAP, compaction planning);
    #   round 15 seed: plans/staged_round15.py, 8 queries (association
    #     rules, Theil-Sen slope, LLR collocations, coverage/diversity
    #     eval, MASE backtest, 2-D skyline, trending rank shift, TwoNN
    #     intrinsic dimension) — a full batch, promotion-ready.
    #   All oracled + strict-mirror parity-tested at two SFs.
]

CHECK_LAST: list[str] = [
    # (empty since round 8: minhash_lsh_near_duplicates left when its
    # gate oracle landed — it now sits in the round-8 window for its
    # first hash-verified row.)
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
