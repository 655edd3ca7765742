"""ROUND-11 STAGING SEED — implemented, tested, NOT driver-registered.

Rounds 8-10 are already planned/staged (registry ROTATION NOTES;
plans/staged_round9.py, staged_round10.py), so this seed stages three
windows out. Same contract as every staging round: full DuckDB oracles
replayed value-for-value (strict-mirror parity at sf0.001 + sf0.01 in
tests/test_staged_round11.py) and behavior-pinning unit tests; a later
round registers them by pointing ``_stage`` at ``registry.register``.

The seed is the EXACT-SIMILARITY-JOIN family
(operators/similarity_join.py) — the deterministic companions to the
approximate MinHash/SimHash/hyperplane LSH family, for contracts where
"every qualifying pair, provably" is required:

- FastSS 1-deletion-neighborhood join: exact Levenshtein ≤ 1 pairs
  from ONE variant-key equi-join (Σ chars of variant rows, no n²
  matrix, no block-key assumption — contrast the blocked
  levenshtein_similar_names).
- Prefix-filter set-similarity join (SSJoin/PPJoin): exact
  3-word-shingle Jaccard ≥ 1/2 pairs (the MinHash family's threshold
  regime, certified instead of approximated); candidates only from
  rarest-first prefix shingles under integer length + positional
  filters; membership decided by the INTEGER predicate
  den·|A∩B| ≥ num·|A∪B|, never a float.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.plans.registry import has_sql_line_comment
from pinterest_data_pipeline_spark.sources.parquet import load_table

STAGED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
STAGED_ORACLE: dict[str, str] = {}


def _stage(name: str, oracle: str | None = None):
    """registry.register's contract, into the round-11 staging dicts."""

    def deco(fn):
        if name in STAGED_QUERIES:
            raise ValueError(f"duplicate staged query name: {name}")
        if oracle is not None and has_sql_line_comment(oracle):
            raise ValueError(f"oracle for {name} contains a `--` SQL comment")
        STAGED_QUERIES[name] = fn
        if oracle is not None:
            STAGED_ORACLE[name] = " ".join(oracle.split())
        return fn

    return deco


@_stage(
    "fastss_customer_name_pairs",
    oracle="""
    WITH v AS (
        SELECT DISTINCT c_custkey AS id, c_name AS name,
               CASE WHEN i = 0 THEN c_name
                    ELSE substr(c_name, 1, i - 1) || substr(c_name, i + 1)
               END AS var
        FROM customer, UNNEST(range(0, length(c_name) + 1)) AS r(i)
    ),
    cand AS (
        SELECT DISTINCT a.id AS key_a, b.id AS key_b,
               a.name AS name_a, b.name AS name_b
        FROM v a JOIN v b ON a.var = b.var AND a.id < b.id
    )
    SELECT key_a, key_b, name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS INTEGER) AS ed
    FROM cand WHERE levenshtein(name_a, name_b) <= 1
    ORDER BY key_a, key_b
    """,
)
def fastss_customer_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT edit-distance ≤ 1 customer-name pairs via FastSS
    1-deletion neighborhoods (operators/similarity_join) — the
    record-linkage join that needs no block key: Customer#000000417 vs
    Customer#000000418 collide on the variant that deletes the
    differing digit. The DuckDB oracle replays the identical variant
    construction, candidate join, and levenshtein verification.

    Scale: Σ(len+1) variant rows through one equi-join shuffle; verify
    on candidates only."""
    from pinterest_data_pipeline_spark.operators.similarity_join import (
        edit_distance_one_pairs,
    )

    cust = load_table(spark, sf_dir, "customer")
    return edit_distance_one_pairs(cust, "c_custkey", "c_name")


@_stage(
    "jaccard_exact_doc_pairs",
    oracle="""
    WITH t AS (
        SELECT doc_id AS id,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT id,
               toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS w
        FROM t, UNNEST(range(1, len(toks) - 1)) AS r(i)
    ),
    freq AS (SELECT w, CAST(count(*) AS BIGINT) AS f FROM sh GROUP BY w),
    sets AS (
        SELECT id, list(s.w ORDER BY f.f, s.w) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM sh s JOIN freq f USING (w) GROUP BY id
    ),
    pre AS (
        SELECT id, n, i AS p, s[CAST(i AS INTEGER)] AS w
        FROM sets,
             UNNEST(range(1, n - ((1 * n + 1) // 2) + 2)) AS r(i)
    ),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM pre a JOIN pre b ON a.w = b.w AND a.id < b.id
        WHERE 2 * a.n >= 1 * b.n AND 2 * b.n >= 1 * a.n
          AND LEAST(a.n - a.p, b.n - b.p) + 1
              >= (1 * (a.n + b.n) + 2) // 3
    ),
    ver AS (
        SELECT c.id_a, c.id_b,
               CAST(len(list_intersect(sa.s, sb.s)) AS BIGINT) AS n_inter,
               CAST(sa.n + sb.n - len(list_intersect(sa.s, sb.s))
                    AS BIGINT) AS n_union
        FROM cand c JOIN sets sa ON sa.id = c.id_a
                    JOIN sets sb ON sb.id = c.id_b
    )
    SELECT id_a, id_b, n_inter, n_union,
           round(CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE), 6)
               AS jaccard_r6
    FROM ver WHERE 2 * n_inter >= 1 * n_union
    ORDER BY id_a, id_b
    """,
)
def jaccard_exact_doc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 3-word-shingle Jaccard ≥ 1/2 document pairs via PPJoin
    prefix filtering (operators/similarity_join) — the provably-
    complete companion to the banded MinHash near-dup family at the
    SAME threshold regime (minhash_dedup_clusters verifies at 0.5):
    MinHash trades a recall curve for cost; this certifies every
    qualifying pair. Shingles, not raw words — the corpus's 31-token
    word vocabulary makes word-set similarity degenerate (everything
    resembles everything; measured 1.6e9 candidates at ×30), while the
    16k+ shingle universe is discriminative. Rarest-first order,
    integer prefix lengths, integer length/positional PPJoin filters,
    integer verify predicate 2·|A∩B| ≥ |A∪B|.

    Scale: candidates from prefix-shingle collisions only; the exact
    intersection runs on candidates. Output against an all-duplicated
    corpus is inherently quadratic — time tracks output (the winnowing
    precedent)."""
    from pinterest_data_pipeline_spark.operators.similarity_join import (
        jaccard_exact_join,
    )

    docs = load_table(spark, sf_dir, "documents")
    return jaccard_exact_join(docs, "doc_id", "text", 1, 2, shingle_size=3)


@_stage(
    "containment_exact_doc_pairs",
    oracle="""
    WITH t AS (
        SELECT doc_id AS id,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT id,
               toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS w
        FROM t, UNNEST(range(1, len(toks) - 1)) AS r(i)
    ),
    freq AS (SELECT w, CAST(count(*) AS BIGINT) AS f FROM sh GROUP BY w),
    sets AS (
        SELECT id, list(s.w ORDER BY f.f, s.w) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM sh s JOIN freq f USING (w) GROUP BY id
    ),
    pre_a AS (
        SELECT id, s[CAST(i AS INTEGER)] AS w
        FROM sets,
             UNNEST(range(1, n - ((4 * n + 4) // 5) + 2)) AS r(i)
    ),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM pre_a a JOIN sh b ON a.w = b.w AND a.id <> b.id
    ),
    ver AS (
        SELECT c.id_a, c.id_b, sa.n AS n_a, sb.n AS n_b,
               CAST(len(list_intersect(sa.s, sb.s)) AS BIGINT) AS n_inter
        FROM cand c JOIN sets sa ON sa.id = c.id_a
                    JOIN sets sb ON sb.id = c.id_b
    )
    SELECT id_a, id_b, n_a, n_b, n_inter,
           round(CAST(n_inter AS DOUBLE) / CAST(n_a AS DOUBLE), 6)
               AS containment_r6
    FROM ver WHERE 5 * n_inter >= 4 * n_a
    ORDER BY id_a, id_b
    """,
)
def containment_exact_doc_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT 3-shingle containment ≥ 4/5 ordered pairs
    (operators/similarity_join.containment_exact_join) — the asymmetric
    quote/excerpt detector symmetric Jaccard misses (a short document
    fully inside a long one has tiny Jaccard but containment 1). The
    probe side's rare-shingle prefix generates candidates against full
    posting lists; the verify predicate is the integer
    5·|A∩B| ≥ 4·|A|.

    Scale: candidates bounded by the rare-prefix posting lists; exact
    intersection on candidates only."""
    from pinterest_data_pipeline_spark.operators.similarity_join import (
        containment_exact_join,
    )

    docs = load_table(spark, sf_dir, "documents")
    return containment_exact_join(docs, "doc_id", "text", 4, 5, 3)


@_stage(
    "zorder_layout_pruning_report",
    oracle="""
    WITH base AS (
        SELECT l_orderkey * 10 + l_linenumber AS id,
               CAST(l_partkey AS BIGINT) AS a,
               CAST(l_suppkey AS BIGINT) AS b
        FROM lineitem
    ),
    mm AS (
        SELECT MIN(a) AS a_min, MAX(a) AS a_max,
               MIN(b) AS b_min, MAX(b) AS b_max
        FROM base
    ),
    q AS (
        SELECT id,
               ((a - mm.a_min) * 256) // (mm.a_max - mm.a_min + 1) AS da,
               ((b - mm.b_min) * 256) // (mm.b_max - mm.b_min + 1) AS db
        FROM base CROSS JOIN mm
    ),
    z AS (SELECT id, da, db, ((da // 1) % 2) * 2 + ((db // 1) % 2) * 1 + ((da // 2) % 2) * 8 + ((db // 2) % 2) * 4 + ((da // 4) % 2) * 32 + ((db // 4) % 2) * 16 + ((da // 8) % 2) * 128 + ((db // 8) % 2) * 64 + ((da // 16) % 2) * 512 + ((db // 16) % 2) * 256 + ((da // 32) % 2) * 2048 + ((db // 32) % 2) * 1024 + ((da // 64) % 2) * 8192 + ((db // 64) % 2) * 4096 + ((da // 128) % 2) * 32768 + ((db // 128) % 2) * 16384 AS zk FROM q),
    lay AS (
        SELECT 'insertion' AS layout,
               ntile(64) OVER (ORDER BY id) AS bucket, da, db FROM z
        UNION ALL
        SELECT 'sort_a', ntile(64) OVER (ORDER BY da, id), da, db FROM z
        UNION ALL
        SELECT 'zorder', ntile(64) OVER (ORDER BY zk, id), da, db FROM z
    ),
    boxes AS (
        SELECT layout, bucket, CAST(count(*) AS BIGINT) AS rows_n,
               MIN(da) AS a_lo, MAX(da) AS a_hi,
               MIN(db) AS b_lo, MAX(db) AS b_hi
        FROM lay GROUP BY layout, bucket
    )
    SELECT layout, CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(SUM(CASE WHEN a_hi >= 96 AND a_lo <= 159
                          AND b_hi >= 96 AND b_lo <= 159
                    THEN 1 ELSE 0 END) AS BIGINT) AS buckets_read,
           CAST(SUM(CASE WHEN a_hi >= 96 AND a_lo <= 159
                          AND b_hi >= 96 AND b_lo <= 159
                    THEN rows_n ELSE 0 END) AS BIGINT) AS rows_read,
           CAST((1000000 * SUM(CASE WHEN a_hi >= 96 AND a_lo <= 159
                                     AND b_hi >= 96 AND b_lo <= 159
                               THEN rows_n ELSE 0 END))
                // SUM(rows_n) AS BIGINT) AS read_ppm
    FROM boxes GROUP BY layout ORDER BY layout
""",
)
def zorder_layout_pruning_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Z-order layout payoff, measured (operators/zorder): the same
    central-quarter 2-D predicate on (l_partkey, l_suppkey) scored
    against zone-map pruning under three layouts — insertion order,
    single-column sort, Morton interleave. The number a 100 TB layout
    rewrite is justified by: insertion reads ~every bucket, sort_a
    prunes only dimension A, z-order prunes both. Quantization, the
    Morton key, and every reported value are pure integer arithmetic
    replayed by the oracle; the curve uses (d div 2^b) mod 2 terms so
    no engine bit operator enters the comparison.

    Scale: min/max one broadcast aggregate; keys are per-row codegen
    expressions; the ntile layouts exist to make the REPORT
    deterministic — the production writer uses repartitionByRange on
    the same Morton key."""
    from pinterest_data_pipeline_spark.operators.zorder import (
        zorder_pruning_report,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rid"),
        "l_partkey",
        "l_suppkey",
    )
    return zorder_pruning_report(li, "rid", "l_partkey", "l_suppkey")
