"""Bucket-checksum table reconciliation (anti-entropy diff) — the
Merkle-tree discipline Dynamo/Cassandra replicas use, flattened to one
level for a batch engine: compare two versions of a table by CHEAP
bucket summaries first, then compute the exact row-level diff ONLY
inside buckets whose summaries disagree.

Why it matters at 100 TB: the naive table diff is a full-outer join of
two 100 TB relations — two complete shuffles of everything, almost all
of it identical. The bucket pass is two map-side-combinable aggregates
(each a metadata-sized output: n_buckets rows), and the exact pass
shuffles only the rows of differing buckets — cost proportional to the
CHANGE SET, not the table. With b buckets and d changed rows, expected
exact-pass volume is ≈ d·(rows/b)·(extra same-bucket passengers) —
tunable by b.

Engine-portability: the row fingerprint is the md5-prefix bigint of a
canonical ``key|payload`` string (portable_hash32's discipline), the
bucket is ``key mod n_buckets``, and the bucket summary is
(count, SUM(fingerprint)) — exact integer arithmetic any engine
replays bit-identically. SUM over 32-bit prefixes stays far below
bigint overflow (2^32 × 2^31 rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_fingerprint(cols: list[Column | str]) -> Column:
    """md5-prefix bigint of the canonical '|'-joined representation."""
    parts = [
        (F.col(c) if isinstance(c, str) else c).cast("string")
        for c in cols
    ]
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", *parts)), 1, 8), 16, 10
    ).cast("long")


def _bucketed(
    df: DataFrame, key_col: str, payload_cols: list[str], n_buckets: int
) -> DataFrame:
    return df.select(
        F.col(key_col).alias("__k"),
        (F.col(key_col) % F.lit(n_buckets)).cast("long").alias("__b"),
        row_fingerprint([key_col, *payload_cols]).alias("__fp"),
    )


def merkle_diff(
    v1: DataFrame,
    v2: DataFrame,
    key_col: str,
    payload_cols: list[str],
    n_buckets: int = 256,
) -> DataFrame:
    """Exact row-level diff of two table versions, computed the
    anti-entropy way. Returns one row per differing key:
    (key, bucket, change_type ∈ {'added','removed','modified'}) —
    'added' = in v2 only, 'removed' = in v1 only, 'modified' = both
    sides but payload fingerprints differ.

    ``key_col`` must be unique per version (a keyed table contract).

    Plan shape: two scans → two bucket summaries (map-side combine,
    n_buckets output rows each) → the differing-bucket list broadcasts
    into semi-join filters on both versions → one key-equi full-outer
    join over ONLY those buckets' rows."""
    b1 = _bucketed(v1, key_col, payload_cols, n_buckets)
    b2 = _bucketed(v2, key_col, payload_cols, n_buckets)

    def summary(b: DataFrame, tag: str) -> DataFrame:
        return b.groupBy("__b").agg(
            F.count(F.lit(1)).alias(f"__n{tag}"),
            F.sum("__fp").alias(f"__s{tag}"),
        )

    # v1/v2 usually share lineage (a version is a transformation of the
    # base), so the summaries are tagged apart instead of relying on
    # post-join df["col"] resolution, which Spark flags as ambiguous on
    # self-join lineages.
    differing = (
        summary(b1, "1")
        .join(summary(b2, "2"), "__b", "full_outer")
        .where(
            ~(
                F.col("__n1").eqNullSafe(F.col("__n2"))
                & F.col("__s1").eqNullSafe(F.col("__s2"))
            )
        )
        .select("__b")
    )
    d1 = b1.join(F.broadcast(differing), "__b", "left_semi")
    d2 = b2.join(F.broadcast(differing), "__b", "left_semi")
    joined = d1.alias("a").join(
        d2.alias("b"), F.col("a.__k") == F.col("b.__k"), "full_outer"
    )
    return joined.select(
        F.coalesce(F.col("a.__k"), F.col("b.__k")).alias("key"),
        F.coalesce(F.col("a.__b"), F.col("b.__b")).alias("bucket"),
        F.when(F.col("a.__k").isNull(), F.lit("added"))
        .when(F.col("b.__k").isNull(), F.lit("removed"))
        .otherwise(F.lit("modified"))
        .alias("change_type"),
    ).where(
        F.col("change_type").isin("added", "removed")
        | (F.col("a.__fp") != F.col("b.__fp"))
    )


def idempotency_audit(
    delivered: DataFrame,
    id_col: str,
    payload_col,
    group_col: str,
) -> DataFrame:
    """At-least-once delivery audit — the ingest-trust sibling of the
    merkle diff: a bus that guarantees at-least-once re-delivers
    messages, and a correct pipeline dedups them by id; this audit
    CLASSIFIES the duplicates before the dedup throws them away,
    because the two classes mean opposite things:

    - clean dupes (same id, identical payload): the expected redelivery
      noise — safe to drop, worth trending as a transport-health rate;
    - conflicts (same id, ≥2 DISTINCT payloads): corruption or a
      producer bug — an id whose payload changed between deliveries
      must page someone, and dedup-by-id would have silently kept an
      arbitrary version.

    ``payload_col``: a Column or name whose exact equality defines
    "identical" (hash or canonical integer encoding — the caller
    decides what payload identity means). Output per ``group_col``:
    n_delivered, n_logical (distinct ids), n_clean_dupe_ids,
    n_conflict_ids — all exact bigints.

    Scale: ONE (group, id) aggregate (count + distinct-payload count —
    the distinct is per id, a handful of deliveries, never
    corpus-sized) feeding one per-group fold. No self-join."""
    payload = (
        F.col(payload_col) if isinstance(payload_col, str) else payload_col
    )
    per_id = delivered.groupBy(
        F.col(group_col).alias("__g"), F.col(id_col).alias("__id")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("__copies"),
        F.count_distinct(payload).cast("long").alias("__versions"),
    )
    return (
        per_id.groupBy("__g")
        .agg(
            F.sum("__copies").cast("bigint").alias("n_delivered"),
            F.count(F.lit(1)).cast("bigint").alias("n_logical"),
            F.sum(
                F.when(
                    (F.col("__copies") > 1) & (F.col("__versions") == 1), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_clean_dupe_ids"),
            F.sum(F.when(F.col("__versions") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_conflict_ids"),
        )
        .select(
            F.col("__g").alias(group_col),
            "n_delivered",
            "n_logical",
            "n_clean_dupe_ids",
            "n_conflict_ids",
        )
    )
