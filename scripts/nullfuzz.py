"""NULL-fuzz parity harness: strict-mirror checks on NULL-injected data.

The driver testdata carries no NULLs in most columns, so a query whose
engine and oracle disagree ONLY on NULL rows passes every standing
check and ships a latent strict-mirror break — exactly the class the
round-11 advisor found twice in staged_round17 (a trigram oracle that
counted NULL-state paths, a t-closeness oracle whose JOIN USING
dropped NULL quasi-classes). This harness hunts those proactively:

1. copy each testdata table to ``--out`` with DETERMINISTIC NULLs
   injected — for the i-th fuzzed column of a table, rows where
   (primary id) % 53 == 7 + i get NULL in that column, so every
   column's NULL stripe hits a different row subset and reruns are
   bit-identical;
2. run every staged query (rounds 14-18) engine-vs-oracle on the
   fuzzed directory with the SAME comparator the driver uses;
3. print one line per query: OK / MISMATCH (with the comparator's
   problem list) / both-sides-error (engines agreeing that the input
   is illegal is fine) / ENGINE-ONLY-ERROR (a throw the oracle
   survives — an ANSI hazard).

A MISMATCH here is not automatically a bug — some queries legitimately
define NULL handling the data can't reach — but every line deserves a
verdict, and fixes land as oracle/engine NULL-hardening commits.

Usage:
    python scripts/nullfuzz.py [--sf /root/testdata/sf0.001] \
        [--out /tmp/nullfuzz_sf0.001] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

# (table, primary id column, columns to fuzz)
FUZZ_PLAN = {
    "documents": ("doc_id", ["lang", "source", "n_chars", "text"]),
    "orders": (
        "o_orderkey",
        ["o_orderstatus", "o_orderpriority", "o_totalprice", "o_custkey"],
    ),
    "customer": (
        "c_custkey",
        ["c_mktsegment", "c_acctbal", "c_name", "c_nationkey"],
    ),
    "events": ("event_id", ["event_type", "value", "user_id", "props"]),
    "lineitem": ("l_orderkey", ["l_suppkey", "l_partkey", "l_quantity"]),
    "supplier": ("s_suppkey", ["s_acctbal"]),
    "part": ("p_partkey", ["p_size"]),
    "nation": ("n_nationkey", []),
    "region": ("r_regionkey", []),
    "embeddings": ("vec_id", []),
}


def make_fuzzed(spark, src: str, out: str) -> None:
    # single-FILE parquet on purpose: the DuckDB oracle side reads
    # {out}/{table}.parquet as one file, exactly like the driver
    # testdata layout (Spark's writer would emit a directory)
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out, exist_ok=True)
    for table, (idc, cols) in FUZZ_PLAN.items():
        path = f"{src}/{table}.parquet"
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        for i, c in enumerate(cols):
            stripe = F.pmod(F.col(idc), F.lit(53)) == (7 + i)
            df = df.withColumn(
                c,
                F.when(stripe, F.lit(None).cast(dict(df.dtypes)[c])).otherwise(
                    F.col(c)
                ),
            )
        src_schema = pq.read_schema(path)
        tbl = pa.Table.from_pandas(
            df.toPandas(), preserve_index=False
        ).cast(src_schema)
        pq.write_table(tbl, f"{out}/{table}.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/nullfuzz_sf0.001")
    ap.add_argument("--only", default=None)
    ap.add_argument(
        "--registered",
        action="store_true",
        help="fuzz the registry surface (optionally --window-only)",
    )
    ap.add_argument(
        "--window-only",
        action="store_true",
        help="with --registered: just the driver-checked first 50",
    )
    args = ap.parse_args()

    from pinterest_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="nullfuzz")
    make_fuzzed(spark, args.sf, args.out)
    print(f"# fuzzed tables written to {args.out}", file=sys.stderr)

    import importlib

    from tests.oracle_utils import compare_frames, duckdb_connection

    qs: dict = {}
    oracles: dict = {}
    if args.registered:
        import __spark_entry__ as entry_mod

        names = list(entry_mod.queries())
        if args.window_only:
            names = names[:50]
        qs = {n: entry_mod.queries()[n] for n in names}
        oracles = {
            n: s for n, s in entry_mod.oracle_sql().items() if n in qs
        }
    else:
        for n in range(14, 19):
            m = importlib.import_module(
                f"pinterest_data_pipeline_spark.plans.staged_round{n}"
            )
            qs.update(m.STAGED_QUERIES)
            oracles.update(m.STAGED_ORACLE)

    only = set(args.only.split(",")) if args.only else None
    n_ok = n_bad = 0
    for name in sorted(qs):
        if only is not None and name not in only:
            continue
        eng_err = orc_err = None
        spark_pdf = oracle_pdf = None
        try:
            spark_pdf = qs[name](spark, args.out).toPandas()
        except Exception as ex:  # noqa: BLE001 — triage harness
            eng_err = str(ex).splitlines()[0][:160]
        if name in oracles:
            con = duckdb_connection(args.out)
            try:
                oracle_pdf = con.execute(oracles[name]).fetchdf()
            except Exception as ex:  # noqa: BLE001
                orc_err = str(ex).splitlines()[0][:160]
            finally:
                con.close()
        if eng_err and orc_err:
            print(f"both-error {name}: engine={eng_err} oracle={orc_err}")
            n_ok += 1
        elif eng_err:
            print(f"ENGINE-ONLY-ERROR {name}: {eng_err}")
            n_bad += 1
        elif orc_err:
            print(f"ORACLE-ONLY-ERROR {name}: {orc_err}")
            n_bad += 1
        else:
            problems = compare_frames(spark_pdf, oracle_pdf)
            if problems:
                print(f"MISMATCH {name}: {problems}")
                n_bad += 1
            else:
                print(f"OK {name}")
                n_ok += 1
    print(f"# nullfuzz: {n_ok} ok, {n_bad} need triage", file=sys.stderr)


if __name__ == "__main__":
    main()
