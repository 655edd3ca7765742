"""NULL-fuzz strict-mirror guard: every staged query must agree with
its DuckDB oracle on NULL-INJECTED data, not just on the clean driver
testdata.

Round-12 provenance: running scripts/nullfuzz.py the first time found
EIGHT latent parity breaks across staged rounds 14-17 — oracles whose
equality joins dropped NULL classes, rank windows where Spark (NULLS
FIRST) and DuckDB (NULLS LAST) silently ranked NULLs at opposite ends,
a COUNT(DISTINCT)-vs-distinct-then-count split, and a skyline where an
unfiltered NULL row survives NOT-EXISTS but not the window
decomposition. All were invisible to the standing two-SF parity tests
because the testdata carries no NULLs in those columns. This test
keeps the class extinct: new staged queries are checked here the day
they are authored.

The fuzz is deterministic (see scripts/nullfuzz.FUZZ_PLAN): column i
of a table gets NULLs exactly where (primary id) % 53 == 7 + i.
"""

from __future__ import annotations

import importlib
import os

import pytest

from tests.oracle_utils import (
    compare_frames,
    duckdb_connection,
    exotic_oracle_columns,
)

FUZZ_DIR = "/tmp/nullfuzz_pytest_sf0.001"


def _staged() -> tuple[dict, dict]:
    qs: dict = {}
    oracles: dict = {}
    for n in range(14, 19):
        m = importlib.import_module(
            f"pinterest_data_pipeline_spark.plans.staged_round{n}"
        )
        qs.update(m.STAGED_QUERIES)
        oracles.update(m.STAGED_ORACLE)
    return qs, oracles


STAGED_QUERIES, STAGED_ORACLE = _staged()


@pytest.fixture(scope="session")
def fuzz_dir(spark):
    from scripts.nullfuzz import make_fuzzed

    marker = os.path.join(FUZZ_DIR, "customer.parquet")
    if not os.path.exists(marker):
        make_fuzzed(spark, "/root/testdata/sf0.001", FUZZ_DIR)
    return FUZZ_DIR


@pytest.mark.parametrize("name", sorted(STAGED_QUERIES))
def test_staged_query_matches_oracle_on_null_fuzz(spark, fuzz_dir, name):
    spark_pdf = STAGED_QUERIES[name](spark, fuzz_dir).toPandas()
    con = duckdb_connection(fuzz_dir)
    try:
        assert not exotic_oracle_columns(con, STAGED_ORACLE[name])
        oracle_pdf = con.execute(STAGED_ORACLE[name]).fetchdf()
    finally:
        con.close()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{name}@nullfuzz: {problems}"
