"""Round-11 seed parity + behavior: the exact-similarity-join pair
(FastSS edit-distance ≤ 1, prefix-filter shingle Jaccard) must already
pass the exact check the driver will run once registered — strict-mirror
value comparison against their DuckDB oracles — and each algorithm's
completeness claim is pinned against brute force on constructed data.

Staged queries are deliberately NOT in plans/registry (rounds 8-10 are
already planned/staged); see plans/staged_round11.py.
"""

from __future__ import annotations

import itertools

import pytest

from pinterest_data_pipeline_spark.plans.staged_round11 import (
    STAGED_ORACLE,
    STAGED_QUERIES,
)
from tests.oracle_utils import (
    compare_frames,
    duckdb_connection,
    exotic_oracle_columns,
)


def test_staged_queries_are_not_registered():
    import __spark_entry__ as entry_mod

    overlap = set(STAGED_QUERIES) & set(entry_mod.queries())
    assert not overlap, f"staged queries leaked into the registry: {overlap}"


def test_every_staged_query_has_an_oracle():
    assert set(STAGED_ORACLE) == set(STAGED_QUERIES)


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
@pytest.mark.parametrize("name", sorted(STAGED_QUERIES))
def test_staged_query_matches_oracle(spark, name, sf):
    d = f"/root/testdata/{sf}"
    spark_pdf = STAGED_QUERIES[name](spark, d).toPandas()
    con = duckdb_connection(d)
    try:
        assert not exotic_oracle_columns(con, STAGED_ORACLE[name])
        oracle_pdf = con.execute(STAGED_ORACLE[name]).fetchdf()
    finally:
        con.close()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{name}@{sf}: {problems}"
    assert len(spark_pdf) > 0


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fastss_equals_brute_force(spark):
    """Constructed names covering substitution, insertion, deletion,
    exact duplicates, and ED=2 non-pairs: the variant join must find
    EXACTLY the brute-force ED ≤ 1 pair set."""
    from pinterest_data_pipeline_spark.operators.similarity_join import (
        edit_distance_one_pairs,
    )

    names = [
        (1, "kitten"), (2, "sitten"),   # substitution
        (3, "kittens"),                 # insertion vs 1
        (4, "kitte"),                   # deletion vs 1
        (5, "kitten"),                  # exact duplicate of 1
        (6, "mitten"),                  # substitution vs 1
        (7, "banana"),                  # unrelated
        (8, "bananas"), (9, "bananaz"),
        (10, "xyzzy"),                  # ED 2+ from all
    ]
    df = spark.createDataFrame(names, "id long, name string")
    got = {
        (r["key_a"], r["key_b"], r["ed"])
        for r in edit_distance_one_pairs(df, "id", "name").collect()
    }
    brute = set()
    for (ia, na), (ib, nb) in itertools.combinations(names, 2):
        ed = _levenshtein(na, nb)
        if ed <= 1:
            brute.add((min(ia, ib), max(ia, ib), ed))
    assert got == brute
    assert (1, 5, 0) in got  # the exact-duplicate pair rode along
    assert (1, 3, 1) in got and (1, 4, 1) in got  # insert + delete


def test_jaccard_prefix_join_equals_brute_force(spark):
    """Constructed token sets around the 19/20 boundary: the prefix
    join must find exactly the brute-force qualifying pairs, including
    the identical-set pair (J = 1) and excluding a J = 18/19 near-miss."""
    from pinterest_data_pipeline_spark.operators.similarity_join import (
        jaccard_exact_join,
    )

    base = [f"t{i:02d}" for i in range(19)]
    docs = [
        (1, " ".join(base + ["x1"])),          # 20 tokens
        (2, " ".join(base + ["x1"])),          # identical to 1: J = 1
        (3, " ".join(base + ["x2"])),          # J(1,3) = 19/21 < 19/20
        (4, " ".join(base)),                   # J(1,4) = 19/20 boundary
        (5, "completely different words here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"], r["n_inter"], r["n_union"])
        for r in jaccard_exact_join(
            df, "doc_id", "text", 19, 20, shingle_size=1
        ).collect()
    }

    def toks(t):
        return set(t.split())

    brute = set()
    for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
        inter = len(toks(ta) & toks(tb))
        union = len(toks(ta) | toks(tb))
        if 20 * inter >= 19 * union:
            brute.add((min(ia, ib), max(ia, ib), inter, union))
    assert got == brute
    assert (1, 2, 20, 20) in got       # identical pair
    assert (1, 4, 19, 20) in got       # boundary pair INCLUDED (>=)
    assert not any(p[:2] == (1, 3) for p in got)  # 19/21 excluded


def test_jaccard_shingles_find_planted_near_dup(spark):
    """3-word shingles: a document and its one-word-edited copy share
    most shingles (J ≥ 1/2) while an unrelated doc pairs with nothing;
    too-short docs (< 3 tokens) never pair."""
    from pinterest_data_pipeline_spark.operators.similarity_join import (
        jaccard_exact_join,
    )

    base = " ".join(f"w{i}" for i in range(30))
    edited = base.replace("w15", "zz")
    docs = [
        (1, base),
        (2, edited),
        (3, "totally different content " * 8),
        (4, "too short"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in jaccard_exact_join(
            df, "doc_id", "text", 1, 2, shingle_size=3
        ).collect()
    }
    assert got == {(1, 2)}
    row = jaccard_exact_join(
        df, "doc_id", "text", 1, 2, shingle_size=3
    ).collect()[0]
    # 28 shingles each; the edit breaks 3 of them: inter 25, union 31
    assert (row["n_inter"], row["n_union"]) == (25, 31)


def test_containment_asymmetric_hand_case(spark):
    """A 10-token quote inside a 60-token page: containment(a in b) = 1
    (all of a's shingles appear in b) while Jaccard is far below 1/2;
    the reverse direction does NOT qualify; an unrelated doc pairs with
    nothing."""
    from pinterest_data_pipeline_spark.operators.similarity_join import (
        containment_exact_join,
        jaccard_exact_join,
    )

    quote = " ".join(f"q{i}" for i in range(10))
    page = " ".join(f"p{i}" for i in range(25)) + " " + quote + " " + " ".join(
        f"z{i}" for i in range(25)
    )
    docs = [(1, quote), (2, page), (3, "other stuff entirely here now")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["containment_r6"]
        for r in containment_exact_join(df, "doc_id", "text", 4, 5, 3).collect()
    }
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] == 1.0
    # symmetric Jaccard at 1/2 misses the same pair entirely
    j = jaccard_exact_join(df, "doc_id", "text", 1, 2, 3).collect()
    assert not j


def test_morton_key_hand_values(spark):
    """Bit-interleave spot checks: (1,0) -> 2, (0,1) -> 1, (3,3) -> 15,
    (255,255) -> 65535."""
    from pyspark.sql import functions as F

    from pinterest_data_pipeline_spark.operators.zorder import morton_key

    df = spark.createDataFrame(
        [(1, 0), (0, 1), (3, 3), (255, 255), (170, 85)],
        "d1 long, d2 long",
    )
    got = [
        r["z"]
        for r in df.select(
            morton_key(F.col("d1"), F.col("d2")).alias("z")
        ).collect()
    ]

    def morton(a, b):
        z = 0
        for bit in range(8):
            z |= ((a >> bit) & 1) << (2 * bit + 1)
            z |= ((b >> bit) & 1) << (2 * bit)
        return z

    assert got == [morton(a, b) for a, b in
                   [(1, 0), (0, 1), (3, 3), (255, 255), (170, 85)]]


def test_zorder_prunes_both_dimensions(spark, sf_dir):
    """The report's whole point: z-order must read no more buckets than
    insertion order, and on a genuinely 2-D predicate it must beat the
    single-column sort."""
    from pyspark.sql import functions as F

    from pinterest_data_pipeline_spark.operators.zorder import (
        zorder_pruning_report,
    )
    from pinterest_data_pipeline_spark.sources.parquet import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rid"),
        "l_partkey",
        "l_suppkey",
    )
    rows = {
        r["layout"]: r for r in zorder_pruning_report(
            li, "rid", "l_partkey", "l_suppkey"
        ).collect()
    }
    assert rows["zorder"]["buckets_read"] <= rows["insertion"]["buckets_read"]
    assert rows["zorder"]["buckets_read"] < rows["sort_a"]["buckets_read"]
    assert rows["zorder"]["read_ppm"] < rows["sort_a"]["read_ppm"]
