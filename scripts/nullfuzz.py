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
        [--out /tmp/nullfuzz_sf0.001] [--only name1,name2] \
        [--registered [--window-only]] [--mode null|nan|empty]

``--mode nan`` swaps the poison for NaN (+Infinity on a second stripe)
in DOUBLE columns — hunting ANSI cast/round throws and cross-engine
NaN ordering splits; ``--mode empty`` injects '' into STRING columns —
hunting ''-vs-NULL conflation. Same deterministic stripes throughout.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

# (table, primary id column, columns to fuzz). Timestamp columns sit
# LAST in each list so their stripe indices never shift the indices of
# the original columns (the pinned pytest fuzz dirs must stay
# byte-stable); they are poisoned ONLY by the dedicated `nullts` mode.
FUZZ_PLAN = {
    "documents": ("doc_id", ["lang", "source", "n_chars", "text"]),
    "orders": (
        "o_orderkey",
        [
            "o_orderstatus",
            "o_orderpriority",
            "o_totalprice",
            "o_custkey",
            "o_orderdate",
        ],
    ),
    "customer": (
        "c_custkey",
        ["c_mktsegment", "c_acctbal", "c_name", "c_nationkey"],
    ),
    "events": ("event_id", ["event_type", "value", "user_id", "props", "ts"]),
    "lineitem": (
        "l_orderkey",
        ["l_suppkey", "l_partkey", "l_quantity", "l_shipdate"],
    ),
    "supplier": ("s_suppkey", ["s_acctbal"]),
    "part": ("p_partkey", ["p_size"]),
    "nation": ("n_nationkey", []),
    "region": ("r_regionkey", []),
    # embedding/label are poisoned ONLY by the dedicated `nullemb`
    # mode (empty list on the column's own second stripe as well) —
    # the `null` mode must keep the pinned pytest fuzz dirs
    # byte-stable, and embeddings was never part of its plan.
    "embeddings": ("vec_id", ["embedding", "label"]),
}


def _poison(mode: str, dtype: str, idc: str, c: str, i: int):
    """(condition, value) for fuzz ``mode`` on column ``c`` of Spark
    dtype ``dtype`` — or None when the mode doesn't apply to the type.

    Modes beyond ``null`` probe different hazard classes:
    - ``nan``: NaN on one stripe and +Infinity on a second, DOUBLE
      columns only — hunts ANSI cast/round throws (engine-only-error)
      and cross-engine NaN ordering/aggregation splits;
    - ``empty``: '' on the stripe, STRING columns only — hunts
      ''-vs-NULL conflation (trim/split/md5-of-empty paths);
    - ``nullts``: NULL on the stripe, TIMESTAMP columns only — hunts
      window/session/as-of splits (Spark orders NULL ts FIRST in ASC
      windows, DuckDB LAST) kept separate from ``null`` so the pinned
      pytest fuzz dirs stay byte-stable;
    - ``nullemb``: embeddings-table poison — NULL embedding/label on
      the primary stripe, plus an EMPTY list on the embedding
      column's second stripe — hunts the ANN/PQ/semantic-dedup
      family's missing-vector handling (array folds over NULL,
      zero-dim distances, degenerate norms). Separate mode for the
      same byte-stability reason.
    """
    stripe = F.pmod(F.col(idc), F.lit(53)) == (7 + i)
    is_ts = dtype.startswith("timestamp")
    is_emb = c in ("embedding", "label")
    if mode == "null" and not is_ts and not is_emb:
        return [(stripe, F.lit(None).cast(dtype))]
    if mode == "nullts" and is_ts:
        return [(stripe, F.lit(None).cast(dtype))]
    if mode == "nullemb" and is_emb:
        edits = [(stripe, F.lit(None).cast(dtype))]
        if dtype.startswith("array"):
            empty_stripe = F.pmod(F.col(idc), F.lit(53)) == (33 + i)
            edits.append(
                (empty_stripe, F.array().cast(dtype))
            )
        return edits
    if mode == "nan" and dtype == "double":
        inf_stripe = F.pmod(F.col(idc), F.lit(53)) == (33 + i)
        return [
            (stripe, F.lit(float("nan"))),
            (inf_stripe, F.lit(float("inf"))),
        ]
    if mode == "empty" and dtype == "string":
        return [(stripe, F.lit(""))]
    return None


def make_fuzzed(spark, src: str, out: str, mode: str = "null") -> None:
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
            edits = _poison(mode, dict(df.dtypes)[c], idc, c, i)
            if edits is None:
                continue
            col = F.col(c)
            for cond, val in edits:
                col = F.when(cond, val).otherwise(col)
            df = df.withColumn(c, col)
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
    ap.add_argument(
        "--mode",
        default="null",
        choices=["null", "nan", "empty", "nullts", "nullemb"],
        help="poison value class (see _poison); default NULL stripes",
    )
    args = ap.parse_args()
    if args.mode != "null" and args.out == "/tmp/nullfuzz_sf0.001":
        args.out = f"/tmp/{args.mode}fuzz_sf0.001"

    from pinterest_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="nullfuzz")
    make_fuzzed(spark, args.sf, args.out, args.mode)
    print(
        f"# {args.mode}-fuzzed tables written to {args.out}", file=sys.stderr
    )

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
            if spark_pdf is None:
                # toPandas can WARN-and-return-None when the Arrow
                # conversion dies mid-computation (e.g. a pandas UDF
                # throwing on a NULL group) instead of raising
                eng_err = "toPandas returned None (Arrow mid-run failure)"
        except Exception as ex:  # noqa: BLE001 — triage harness
            eng_err = str(ex).splitlines()[0][:160]
        if name not in oracles:
            # rows-only query (no oracle to mirror): surviving the
            # fuzzed data without an engine throw is the whole check
            if eng_err:
                print(f"ENGINE-ONLY-ERROR {name}: {eng_err}")
                n_bad += 1
            else:
                print(f"OK {name} (rows-only, {len(spark_pdf)} rows)")
                n_ok += 1
            continue
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
