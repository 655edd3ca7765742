"""Rendezvous (highest-random-weight) sharding and the reshard
stability audit — the measured answer to "what does changing the shard
count cost us".

HRW (Thaler & Ravishankar 1996) assigns a key to the shard maximizing
a per-(key, shard) hash. Its defining property: growing n → n' shards
moves a key ONLY to one of the new shards (an old shard can never
overtake another old shard for the same key, since neither hash
changed) — expected movement (n'−n)/n' of keys, the consistent-hashing
guarantee. Naive ``key mod n`` resharding moves ~ 1 − 1/lcm-ish of all
keys: a 100 TB re-bucketing versus a 20% one.

The audit computes BOTH assignments under n and n' for every key and
reports, per strategy: keys moved (exact ppm) and — for HRW — the
count of ILLEGAL moves (old shard → different old shard), which the
HRW property says must be ZERO; the oracle hash-checks that zero, so
the property itself is driver-verified, not assumed.

Engine-portability: the per-(key, shard) weight is the md5-prefix
bigint of ``key ':' shard`` (portable_hash32 discipline). The argmax
is the two-aggregate form — max weight per key, then min shard among
the max-weight rows — identical groupBy math in any engine, no
struct-comparison or window semantics to align.

Scale: explode keys × n (a constant ≤ ~dozens), two map-side
combinable aggregates keyed by the key — no joins against data-sized
relations, no global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _weight(key: Column, shard: Column) -> Column:
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", key.cast("string"), shard.cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")


def hrw_assign(df: DataFrame, key_col: str, n_shards: int) -> DataFrame:
    """(key, shard) under HRW with ``n_shards`` shards. Deterministic:
    max weight wins, ties (md5-prefix collisions) break to the lowest
    shard id via the min-shard-among-max second aggregate."""
    key = F.col(key_col)
    exploded = df.select(
        key.alias("__k"),
        F.explode(
            F.sequence(F.lit(0), F.lit(int(n_shards) - 1))
        ).alias("__s"),
    ).withColumn("__w", _weight(F.col("__k"), F.col("__s")))
    wmax = exploded.groupBy("__k").agg(F.max("__w").alias("__wmax"))
    return (
        exploded.join(wmax, "__k")
        .where(F.col("__w") == F.col("__wmax"))
        .groupBy("__k")
        .agg(F.min("__s").alias("shard"))
        .select(F.col("__k").alias(key_col), "shard")
    )


def reshard_stability(
    df: DataFrame, key_col: str, n_from: int, n_to: int
) -> DataFrame:
    """Movement audit for growing ``n_from`` → ``n_to`` shards
    (n_to > n_from), comparing HRW against mod-N. One row per strategy:

    - ``n_keys``, ``n_moved``, ``moved_ppm`` (exact integer
      parts-per-million, floor division);
    - ``n_illegal_moves``: moves that land on an OLD shard
      (shard < n_from) different from the previous old shard. The HRW
      row's value is a correctness gate (must be 0); the mod row
      reports its actual (large) count — the number quantifying why
      mod-N resharding is a full re-bucketing."""
    if not 0 < n_from < n_to:
        raise ValueError(
            f"need 0 < n_from < n_to, got {n_from} → {n_to}"
        )

    def audit(assign_from: DataFrame, assign_to: DataFrame, tag: str):
        both = assign_from.withColumnRenamed("shard", "__from").join(
            assign_to.withColumnRenamed("shard", "__to"), key_col
        )
        moved = (F.col("__from") != F.col("__to")).cast("long")
        illegal = (
            (F.col("__from") != F.col("__to"))
            & (F.col("__to") < F.lit(n_from))
        ).cast("long")
        agg = both.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(moved).alias("n_moved"),
            F.sum(illegal).alias("n_illegal_moves"),
        )
        return agg.select(
            F.lit(tag).alias("strategy"),
            "n_keys",
            "n_moved",
            F.expr("n_moved * 1000000 div n_keys").alias("moved_ppm"),
            "n_illegal_moves",
        )

    keys = df.select(key_col).distinct()
    hrw = audit(
        hrw_assign(keys, key_col, n_from),
        hrw_assign(keys, key_col, n_to),
        "hrw",
    )
    mod = audit(
        keys.select(
            key_col,
            (F.col(key_col) % F.lit(n_from)).cast("long").alias("shard"),
        ),
        keys.select(
            key_col,
            (F.col(key_col) % F.lit(n_to)).cast("long").alias("shard"),
        ),
        "mod",
    )
    return hrw.unionAll(mod)
