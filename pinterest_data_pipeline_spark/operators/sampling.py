"""Deterministic corpus sampling for training-data pipelines.

Random sampling via RNG is partition-order-dependent and unreproducible
across engines/retries; both operators here derive their "randomness"
from content hashes instead, which is the standard distributed-sampling
trick: every engine, every retry, every round picks the same rows.

- :func:`stratified_sample_exact` — exactly min(k, |stratum|) rows per
  stratum, chosen by md5 order (uniform, deterministic). One shuffle on
  the stratum key; ``WindowGroupLimit`` pushes the top-k below the
  exchange, so the shuffle payload is ~k rows per stratum, not the corpus.
- :func:`repeat_by_weight` — integer up-sampling per domain (the "epochs
  per source" mixture lever, e.g. 3 passes of wiki vs 1 of web). A
  broadcast join attaches the weight and an exploded ``sequence`` emits
  the copies; no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample_exact(
    df: DataFrame, stratum_col: str, id_col: str, k: int
) -> DataFrame:
    """Exactly min(k, stratum size) rows per stratum, deterministic.

    Order within a stratum is md5(id) — uniform pseudo-random yet stable
    across runs, partitionings, and engines (md5 agrees everywhere, unlike
    xxhash64/rand seeds). Output adds ``sample_rank`` (1-based within the
    stratum)."""
    order_key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(stratum_col).orderBy(order_key, F.col(id_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def repeat_by_weight(
    df: DataFrame, domain_col: str, weights: dict[str, int], default: int = 1
) -> DataFrame:
    """Replicate each row ``weights[domain]`` times (``default`` for
    unlisted domains; weight 0 drops the domain). Adds ``copy_id``
    (1..weight). The weight table is driver-side metadata broadcast into
    the scan stage — row replication happens executor-side in the explode,
    never by unioning N scans."""
    spark = df.sparkSession
    wdf = F.broadcast(
        spark.createDataFrame(
            [(k, int(v)) for k, v in weights.items()],
            f"{domain_col} string, __weight int",
        )
    )
    return (
        df.join(wdf, domain_col, "left")
        .withColumn("__weight", F.coalesce("__weight", F.lit(default)))
        .filter(F.col("__weight") > 0)
        .withColumn("copy_id", F.explode(F.sequence(F.lit(1), F.col("__weight"))))
        .drop("__weight")
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    test_upper: str = "0d",
    val_upper: str = "1a",
) -> DataFrame:
    """Deterministic train/val/test assignment by content hash.

    The first two hex chars of ``md5(id)`` are uniform over 256 buckets;
    string comparison against the (hex, zero-padded, lowercase) upper
    bounds carves them into test [00, test_upper), val [test_upper,
    val_upper), train [val_upper, ff]. Defaults give ~5.1% / ~5.1% /
    ~89.8%. Adds a ``split`` column.

    Why not ``rand(seed)``: RNG sampling is partition-order-dependent —
    a retry, a different file split, or a different engine reassigns
    rows. md5 of the id is pure content addressing: every engine, every
    retry, every round lands each row in the same split, and late-arriving
    data never reshuffles earlier assignments. Zero shuffle: the split is
    a per-row expression the optimizer pushes into the scan stage."""
    prefix = F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)
    return df.withColumn(
        "split",
        F.when(prefix < test_upper, F.lit("test"))
        .when(prefix < val_upper, F.lit("val"))
        .otherwise(F.lit("train")),
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 16,
) -> DataFrame:
    """Content-addressed global shuffle: assign every row a shard and a
    position inside it, both derived from ``md5(id)`` — the
    reproducible "shuffle the corpus before training" step.

    Like :func:`hash_split`, this deliberately avoids ``rand(seed)``
    and ``orderBy(rand())``: RNG order is partition-layout-dependent,
    so a retry or re-read would feed the trainer a different example
    order. Hash order is a pure function of row identity.

    Shard = integer value of the first two md5 hex chars (via strpos
    arithmetic — portable to any ANSI engine, unlike Spark's
    ``conv``/murmur ``hash``) mod ``n_shards``; position = rank of the
    md5 digest within the shard.

    Scale: one shuffle on ``shard``; md5 uniformity keeps the
    ``n_shards`` window partitions balanced, and ``n_shards`` is chosen
    ~ cluster parallelism. For writing actual training files you'd
    instead ``repartition(n_shards, shard).sortWithinPartitions(h)`` —
    same layout, no rank materialized; the rank here makes the order
    oracle-checkable."""
    hexpos = "instr('0123456789abcdef', substring(__h, {i}, 1)) - 1"
    h = F.md5(F.col(id_col).cast("string"))
    win = Window.partitionBy("shard").orderBy("__h", id_col)
    return (
        df.withColumn("__h", h)
        .withColumn(
            "shard",
            F.expr(
                f"pmod(({hexpos.format(i=1)}) * 16 + ({hexpos.format(i=2)}),"
                f" {int(n_shards)})"
            ).cast("int"),
        )
        .withColumn("pos", F.row_number().over(win))
        .drop("__h")
    )


def sqrt_temperature_shares(
    df: DataFrame, part_col: str
) -> DataFrame:
    """Temperature-scaled mixture planning at T=2 (the multilingual
    rebalancing rule: sample source i with probability ∝ n_i^(1/2),
    boosting low-resource sources relative to their raw share): per
    ``part_col`` value, the corpus count, its square-root weight, and
    the normalized target share.

    Exactness contract: T=2 specifically because ``sqrt`` is
    IEEE-754-exact (correctly rounded) in every engine, unlike libm
    ``pow``, whose last ulp differs across implementations and would
    break cross-engine value hashes at other temperatures. The
    normalizer folds the per-source weights in SORTED ``part_col``
    order (sort_array + sequential ``aggregate``), so the double sum is
    order-deterministic and reproducible by an ordered list fold on the
    oracle side; outputs round to 6dp (the repo's engine-portable
    rounding).

    Scale: one partial-combinable count per source, then everything runs
    on the |sources|-row aggregate — a broadcast crossJoin of one row.
    The plan's output feeds :func:`repeat_by_weight` (integer epochs) or
    a Bernoulli sampler downstream."""
    counts = df.groupBy(part_col).agg(F.count(F.lit(1)).alias("n_docs"))
    norm = counts.agg(
        F.aggregate(
            F.sort_array(
                F.collect_list(F.struct(F.col(part_col), F.col("n_docs")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + F.sqrt(x["n_docs"].cast("double")),
        ).alias("__norm")
    )
    return (
        counts.crossJoin(F.broadcast(norm))
        .select(
            part_col,
            "n_docs",
            F.round(F.sqrt(F.col("n_docs").cast("double")), 6).alias("w_r6"),
            F.round(
                F.sqrt(F.col("n_docs").cast("double")) / F.col("__norm"), 6
            ).alias("share_r6"),
        )
    )
