"""Isolate and time individual registered queries with the noop sink
(guide §1.4), several runs each, printing per-run seconds. Usage:

    python scripts/isolate.py [-n RUNS] name [name ...]

Uses the same session/warm-up discipline as bench.py so numbers are
comparable to the round record.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: F401
from pinterest_data_pipeline_spark.plans.registry import QUERIES
from pinterest_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    spark = get_spark(app_name="isolate")
    spark.read.parquet(os.path.join(SF_DIR, "nation.parquet")).count()
    spark.range(32).repartition(32).mapInPandas(
        lambda b: b, "id long"
    ).write.format("noop").mode("overwrite").save()
    from pinterest_data_pipeline_spark.plans.staged_round6 import (
        ensure_embedding_band_state,
    )

    ensure_embedding_band_state(spark, SF_DIR)
    for name in args:
        ts = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(time.perf_counter() - t0)
        print(
            f"{name}: min {min(ts):.3f}s  runs "
            + " ".join(f"{t:.3f}" for t in ts),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
