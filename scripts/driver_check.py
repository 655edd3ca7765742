"""Emulate the round driver's CORRECTNESS sweep locally.

Stock SparkSession (no session.py tuning — ANSI defaults, 200 shuffle
partitions), sf0.01 tables, the first-N entries of ``queries()`` in
driver order, each compared against its DuckDB oracle on row count +
schema + order-insensitive values. Run before a round ends:

    python scripts/driver_check.py [N] [start]

Prints one line per query and a JSON summary; exit code 1 on any
mismatch/error so it can gate commits.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod
from tests.oracle_utils import check_query

SF_DIR = os.environ.get("DRIVER_CHECK_SF", "/root/testdata/sf0.01")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-check")
        .getOrCreate()
    )
    names = list(entry_mod.queries())[start : start + n]
    summary: dict[str, str] = {}
    failed = 0
    for name in names:
        t0 = time.time()
        try:
            problems = check_query(spark, name, SF_DIR)
        except Exception as exc:  # mirror the driver: errors are rows, not aborts
            problems = [f"error: {exc!r}"]
            traceback.print_exc()
        dt = time.time() - t0
        status = "ok" if not problems else "; ".join(problems)
        summary[name] = status
        if problems:
            failed += 1
        print(f"{'PASS' if not problems else 'FAIL':4s} {dt:6.2f}s {name}  {status if problems else ''}")
    print(json.dumps({"checked": len(names), "failed": failed}))
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
