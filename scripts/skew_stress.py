"""Hot-key skew stress: measure the salted operators against their naive
forms on a deliberately skewed corpus.

Uniform replication (scripts/stress.py) never exercises the skew path —
every key grows evenly. This harness builds an events table where ONE
user owns half of all rows (the "celebrity key" shape that breaks
hash-partitioned aggregation and joins at 100 TB: one reducer receives
|hot key| rows no matter how many executors exist), then times:

1. naive groupBy(user_id) count/sum   vs  salted_count_sum (two-phase)
2. shuffle join events⋈user-dim on user_id with AQE skew split ON
   (engine default)                   vs  OFF

Results verify bit-identical outputs between naive and salted forms
before timing. Run:

    python scripts/skew_stress.py [replication] [hot_fraction]

Prints one JSON line (recorded as SKEW.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.operators.skew import salted_count_sum
from pinterest_data_pipeline_spark.session import get_spark
from pinterest_data_pipeline_spark.sources.parquet import load_table

SRC_SF = "/root/testdata/sf0.1"
HOT_KEY = 42


def build_skewed(spark, out_path: str, factor: int, hot_fraction: float):
    """Replicate events ``factor``× and point ``hot_fraction`` of all rows
    at one user_id. Deterministic: the hot assignment hashes event_id.

    Replication is a single explode over a replica-index sequence (one
    scan, flat plan) rather than a ``factor``-way union — at factor 900
    the union built a plan tree Catalyst spent minutes folding."""
    base = load_table(spark, SRC_SF, "events")
    df = (
        base.withColumn(
            "__r", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
        )
        .withColumn(
            "event_id",
            F.col("event_id") + F.col("__r").cast("long") * F.lit(10_000_000),
        )
        .drop("__r")
    )
    bound = int(hot_fraction * 1_000_000)
    df = df.withColumn(
        "user_id",
        F.when(
            F.pmod(F.xxhash64("event_id"), F.lit(1_000_000)) < bound,
            F.lit(HOT_KEY).cast("long"),
        ).otherwise(F.col("user_id")),
    )
    df.write.mode("overwrite").parquet(out_path)


def timed(fn):
    # min of two: first run pays codegen (same rationale as stress.py)
    t0 = time.perf_counter()
    fn()
    s1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    fn()
    return min(s1, time.perf_counter() - t0)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    hot_fraction = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    out = f"/tmp/skew_x{factor}"
    spark = get_spark(app_name="skew-stress")
    build_skewed(spark, out, factor, hot_fraction)
    ev = spark.read.parquet(out)
    n = ev.count()
    hot = ev.filter(F.col("user_id") == HOT_KEY).count()
    print(f"# rows={n} hot_key_rows={hot} ({hot/n:.1%})", file=sys.stderr)

    # -- aggregation: naive vs salted (verify identical first) ----------
    def naive_agg():
        return ev.groupBy("user_id").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )

    def salted_agg():
        return salted_count_sum(ev, ["user_id"], "value")

    a = {r["user_id"]: (r["n"], r["total"]) for r in naive_agg().collect()}
    b = {r["user_id"]: (r["n"], r["total"]) for r in salted_agg().collect()}
    assert a == b, "salted aggregation diverged from naive"
    t_naive_agg = timed(lambda: naive_agg().write.format("noop").mode("overwrite").save())
    t_salted_agg = timed(lambda: salted_agg().write.format("noop").mode("overwrite").save())

    # -- join: AQE skew split on (engine default) vs off ----------------
    dim = (
        ev.select("user_id")
        .distinct()
        .withColumn("segment", F.pmod(F.col("user_id"), F.lit(7)))
    )
    dim.write.mode("overwrite").parquet(out + "_dim")
    dimr = spark.read.parquet(out + "_dim")

    def join_count():
        joined = ev.join(dimr.hint("merge"), "user_id").groupBy("segment").agg(
            F.count("*").alias("n")
        )
        joined.write.format("noop").mode("overwrite").save()

    # Local data is small enough that the skewed partition sits under
    # AQE's default 256 MB skew threshold and never splits; scale the
    # thresholds down in the same proportion the data is scaled down, so
    # the run exercises the same decision a 100 TB cluster would make.
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    # the groupBy downstream reuses the join's partitioning, so splitting
    # the skewed partition adds a shuffle — AQE skips the optimization
    # unless forced (at real scale the re-shuffle of |join output| beats
    # a straggler holding half the table)
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    t_join_skewfix = timed(join_count)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    t_join_noskewfix = timed(join_count)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    # -- per-key top-k: naive window vs salted two-phase ---------------
    # THE serializing skew shape: a window over the hot key must move
    # every hot row to one task; no planner fixes it. salted_top_k
    # decomposes it (local top-k per salt, re-rank survivors).
    from pyspark.sql import Window

    from pinterest_data_pipeline_spark.operators.skew import salted_top_k

    order = [F.desc("value"), F.asc("event_id")]

    def naive_topk():
        w = Window.partitionBy("user_id").orderBy(*order)
        return (
            ev.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 10)
        )

    def salted_topk():
        return salted_top_k(ev, ["user_id"], order, k=10)

    a = sorted(
        (r["user_id"], r["rk"], r["event_id"]) for r in naive_topk().collect()
    )
    b = sorted(
        (r["user_id"], r["rk"], r["event_id"]) for r in salted_topk().collect()
    )
    assert a == b, "salted top-k diverged from the naive window"
    t_naive_topk = timed(
        lambda: naive_topk().write.format("noop").mode("overwrite").save()
    )
    t_salted_topk = timed(
        lambda: salted_topk().write.format("noop").mode("overwrite").save()
    )

    print(
        json.dumps(
            {
                "rows": n,
                "hot_fraction": round(hot / n, 4),
                "agg_naive_s": round(t_naive_agg, 2),
                "agg_salted_s": round(t_salted_agg, 2),
                "join_aqe_skew_on_s": round(t_join_skewfix, 2),
                "join_aqe_skew_off_s": round(t_join_noskewfix, 2),
                "topk_naive_window_s": round(t_naive_topk, 2),
                "topk_salted_s": round(t_salted_topk, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
