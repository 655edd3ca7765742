"""Count Spark jobs (driver-synchronized actions) a registered query
executes — the round-floor evidence for the iterative operators: each
job is a full schedule/run/collect round-trip, so fewer jobs per
fixpoint round is the structural win `spark_optimization_guide.md` §2.4
aims at. Usage:

    python scripts/jobcount.py name [name ...]

Runs each query once with the noop sink and prints jobs + wall seconds.
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
    names = sys.argv[1:]
    spark = get_spark(app_name="jobcount")
    sc = spark.sparkContext
    spark.read.parquet(os.path.join(SF_DIR, "nation.parquet")).count()
    spark.range(32).repartition(32).mapInPandas(
        lambda b: b, "id long"
    ).write.format("noop").mode("overwrite").save()
    from pinterest_data_pipeline_spark.plans.staged_round6 import (
        ensure_embedding_band_state,
    )

    ensure_embedding_band_state(spark, SF_DIR)
    tracker = sc.statusTracker()
    for name in names:
        before = set(tracker.getJobIdsForGroup(None) or [])
        sc.setJobDescription(f"jobcount {name}")
        t0 = time.perf_counter()
        QUERIES[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        after = set(tracker.getJobIdsForGroup(None) or [])
        print(f"{name}: {len(after - before)} jobs  {dt:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
