"""Runtime-optimizer demos the 100 TB posture depends on: bloom-filter
join pruning and AQE skew-join splitting.

Both are RUNTIME features: they fire based on observed sizes, so at test
scale the size thresholds must be lowered to make them trigger — the
assertions pin that the engine's plans are eligible (right join shapes,
no config fights), which is exactly what makes the defaults kick in on
real data volumes.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F


def _with_confs(spark, confs):
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    return old


def _restore(spark, old):
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _explain(df, mode=None) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode) if mode else df.explain()
    return buf.getvalue()


def test_bloom_filter_runtime_join_pruning(spark, sf_dir):
    """A selective filter on the build side must inject a bloom
    might_contain predicate on the probe side of a shuffle join, so
    non-matching fact rows die before the exchange. The scan-size
    threshold is zeroed because sf0.01 is below the default gate (10 GB)
    — at target scale the default config triggers this on its own."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = _with_confs(spark, confs)
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "o_orderpriority"
        )
        plan = _explain(joined, "formatted")
        assert "might_contain" in plan, "bloom filter not injected"
        n_bloom = joined.count()
    finally:
        _restore(spark, old)
    # semantics unchanged: same rows as the un-bloomed join
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    assert n_bloom == li.join(orders, li.l_orderkey == orders.o_orderkey).count()


def test_aqe_splits_skewed_join_partition(spark):
    """A 90%-hot key must be split by AQE's skew-join handling
    (SortMergeJoin(skew=true) + AQEShuffleRead skewed in the FINAL
    adaptive plan) instead of serializing into one straggler task.
    Thresholds are lowered to make a ~6 MB hot partition qualify; the
    default 256 MB gate serves the same role on real executors."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    }
    old = _with_confs(spark, confs)
    try:
        left = spark.range(0, 100_000).select(
            F.when(F.col("id") % 10 != 0, F.lit(7))
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        right = spark.range(0, 100).select(
            F.col("id").alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("r_pad"),
        )
        joined = left.join(right, "k")
        # execute THIS dataframe's plan (count() would plan a different
        # query and the final adaptive plan would not attach to `joined`)
        joined.foreach(lambda r: None)
        plan = _explain(joined)  # simple mode carries the skew markers
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "skew join not split"
        # semantics: every left row matches exactly one right key
        assert joined.count() == 100_000
    finally:
        _restore(spark, old)


def test_content_salt_is_deterministic_and_spreads_hot_key(spark):
    """Round-4 advisor regression: the salt feeding the two-phase shuffle
    must be a pure function of row content (attempt-stable), not
    monotonically_increasing_id()/rand() — on a stage retry a row must
    land in the SAME partial group or phase-1 top-k filtering drops or
    duplicates survivors. Pin (a) re-evaluating the salt expression
    yields identical values row-for-row, under different partitioning,
    and (b) a hot key's rows still spread across many salt buckets."""
    from pyspark.sql import functions as F

    from pinterest_data_pipeline_spark.operators.skew import _content_salt

    df = spark.range(10_000).select(
        F.lit(7).alias("k"),
        F.col("id").alias("row_id"),
        (F.col("id") % 997).cast("double").alias("v"),
    )
    a = {
        r["row_id"]: r["s"]
        for r in df.withColumn("s", _content_salt(df, 16)).collect()
    }
    rep = df.repartition(13)
    b = {
        r["row_id"]: r["s"]
        for r in rep.withColumn("s", _content_salt(rep, 16)).collect()
    }
    assert a == b, "salt not a pure function of row content"
    buckets = set(a.values())
    assert len(buckets) == 16 and all(0 <= s < 16 for s in buckets)


def test_salted_topk_equals_naive_window_on_skewed_input(spark):
    """salted_top_k must return EXACTLY the naive window's top-k — rank,
    ties, everything — on an input where one key owns half the rows and
    k exceeds some groups' sizes."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pinterest_data_pipeline_spark.operators.skew import salted_top_k

    df = (
        spark.range(20_000)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit(7))
            .otherwise(F.pmod(F.col("id"), F.lit(500)))
            .alias("k"),
            F.col("id").alias("row_id"),
            (F.pmod(F.col("id") * 37, F.lit(1000))).cast("double").alias("v"),
        )
    )
    order = [F.desc("v"), F.asc("row_id")]
    w = Window.partitionBy("k").orderBy(*order)
    naive = (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .collect()
    )
    salted = salted_top_k(df, ["k"], order, k=10).collect()
    key = lambda r: (r["k"], r["rk"], r["row_id"], r["v"])  # noqa: E731
    assert sorted(map(key, naive)) == sorted(map(key, salted))
    # the hot key (7) and a sparse key both produced rows
    ks = {r["k"] for r in salted}
    assert 7 in ks and len(ks) > 100
