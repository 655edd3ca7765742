"""Behavioral + differential tests for the round-5 promoted operators
(plans/round5_promotions.py): pandas merge_asof differential for the
as-of family, a pure-Python winnowing reference, the winnowing
guarantee property, the embedding-contamination planted-clone pin, the
quality-margin ordering law, and the sqrt-share low-resource boost.

These are the oracle-INDEPENDENT checks: the registered DuckDB oracles
verify value parity, these verify the operators implement the intended
REFERENCE SEMANTICS (recovered verbatim from the round-4 staging test
file, which round 5 deleted on promotion — the oracles alone cannot
catch a bug that both engines reproduce)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_embedding_contamination_flags_planted_clone(spark):
    """Behavioral pin independent of the oracle: a train vector that is a
    near-copy of an eval vector must be flagged with top_score ~1; an
    orthogonal vector must not appear."""
    from pinterest_data_pipeline_spark.operators.decontam import (
        embedding_contamination,
    )

    dim = 8
    eval_vec = [1.0] * dim
    clone = [1.0] * (dim - 1) + [0.9]          # cosine ~0.999
    ortho = [1.0, -1.0] * (dim // 2)            # cosine 0 vs eval_vec
    df = spark.createDataFrame(
        [(0, eval_vec), (1, clone), (2, ortho)],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["vec_id"]: (r["n_eval_hits"], r["top_score"])
        for r in embedding_contamination(
            df, F.col("vec_id") == 0, threshold=0.8
        ).collect()
    }
    assert 1 in out and out[1][0] == 1 and out[1][1] > 0.99
    assert 2 not in out


def test_linear_quality_margin_orders_by_noise(spark):
    """Clean prose (stopwords, few symbols) must out-margin symbol/digit
    noise, and the margin must be an exact integer."""
    from pinterest_data_pipeline_spark.operators.text import (
        linear_quality_margin,
    )

    rows = [
        (1, "the cat is one of the animals that walk to the house"),
        (2, "$$$ 123 456 789 !!! ### 000 %%% 111 @@@"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["m"]
        for r in df.select(
            "doc_id", linear_quality_margin("text").alias("m")
        ).collect()
    }
    assert out[1] > 0 > out[2]
    assert all(isinstance(v, int) for v in out.values())


def test_winnowing_guarantee_shared_passage_yields_shared_fingerprint(spark):
    """The winnowing contract (Schleimer et al.): two documents sharing
    any run of k + window - 1 tokens MUST share at least one selected
    fingerprint; disjoint-vocabulary documents must share none. Also pin
    the compression: per doc, selected minima are (far) fewer than the
    gram stream."""
    from pinterest_data_pipeline_spark.operators.dedup import (
        winnowing_fingerprints,
        winnowing_shared_passages,
    )

    shared = " ".join(f"common{i}" for i in range(12))  # 12-token passage
    rows = [
        (1, "alpha beta " + shared + " gamma delta epsilon"),
        (2, "zeta eta theta " + shared + " iota kappa"),
        (3, " ".join(f"other{i}" for i in range(30))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    k, w = 5, 4
    fps = winnowing_fingerprints(docs, k=k, window=w, portable=True).collect()
    by_doc: dict[int, set] = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared 12-token passage lost"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])
    for doc_id, text in rows:
        n_grams = len(text.split()) - k + 1
        assert len(by_doc[doc_id]) < n_grams, "no compression"

    pairs = winnowing_shared_passages(
        docs, min_shared=1, portable=True
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}


def test_asof_directions_and_nearest_semantics(spark):
    """Pin the as-of family laws on a hand-built timeline: backward takes
    the latest prior row, forward the earliest future row, nearest the
    closer of the two with delta ties preferring backward, and the
    tolerance nulls out matches beyond the bound."""
    import datetime as dt

    from pinterest_data_pipeline_spark.operators.asof import (
        asof_join,
        asof_join_nearest,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)  # noqa: E731
    left = spark.createDataFrame(
        [(1, 1, s(100)),   # prior@90 (d=10) vs future@130 (d=30) -> backward
         (2, 1, s(120)),   # prior@90 (d=30) vs future@130 (d=10) -> forward
         (3, 1, s(110)),   # tie d=20 both sides -> backward wins
         (4, 1, s(5000)),  # nearest is future@130 at d=4870 -> tolerance NULL
         (5, 2, s(50))],   # key with no right rows at all -> NULL
        "lid long, k long, lts timestamp",
    )
    right = spark.createDataFrame(
        [(90, 1, s(90), 900), (130, 1, s(130), 1300)],
        "rid long, k long, rts timestamp, rv long",
    )
    back = {
        r["lid"]: r["rid_asof"]
        for r in asof_join(left, right, "k", "lts", "rts", ["rid"]).collect()
    }
    assert back == {1: 90, 2: 90, 3: 90, 4: 130, 5: None}
    fwd = {
        r["lid"]: r["rid_asof"]
        for r in asof_join(
            left, right, "k", "lts", "rts", ["rid"], direction="forward"
        ).collect()
    }
    assert fwd == {1: 130, 2: 130, 3: 130, 4: None, 5: None}
    near = {
        r["lid"]: (r["rid_asof"], r["rv_asof"])
        for r in asof_join_nearest(
            left, right, "k", "lts", "rts", ["rid", "rv"],
            tolerance_seconds=600.0,
        ).collect()
    }
    assert near == {
        1: (90, 900),
        2: (130, 1300),
        3: (90, 900),       # tie -> backward
        4: (None, None),    # out of tolerance
        5: (None, None),    # no right rows for key
    }


def test_asof_null_ts_follows_join_semantics(spark):
    """NULL timestamps match nothing, in BOTH directions: a NULL-ts
    right row is filtered off the spine, and a NULL-ts left row passes
    through with NULL values (forward's DESC scan would otherwise hand
    it the last carried value under Spark's NULLS LAST desc default)."""
    import datetime as dt

    from pinterest_data_pipeline_spark.operators.asof import (
        asof_join,
        asof_join_nearest,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)  # noqa: E731
    left = spark.createDataFrame(
        [(1, 1, s(100)), (2, 1, None)],
        "lid long, k long, lts timestamp",
    )
    right = spark.createDataFrame(
        [(90, 1, s(90), 900), (999, 1, None, 9990)],
        "rid long, k long, rts timestamp, rv long",
    )
    for direction, want in [
        ("backward", {1: 90, 2: None}),
        ("forward", {1: None, 2: None}),
    ]:
        got = {
            r["lid"]: r["rid_asof"]
            for r in asof_join(
                left, right, "k", "lts", "rts", ["rid"],
                direction=direction,
            ).collect()
        }
        assert got == want, direction
    near = {
        r["lid"]: r["rid_asof"]
        for r in asof_join_nearest(
            left, right, "k", "lts", "rts", ["rid"]
        ).collect()
    }
    assert near == {1: 90, 2: None}


def test_asof_family_matches_pandas_merge_asof(spark):
    """Differential test against an independent reference implementation:
    on random timelines (unique (key, ts) on the right side — pandas
    breaks duplicate-ts ties positionally, ours by value struct), all
    three directions of the operator must agree with pandas.merge_asof,
    including the nearest tie rule (pandas also prefers backward) and
    tolerance handling."""
    import datetime as dt
    import random

    import pandas as pd

    from pinterest_data_pipeline_spark.operators.asof import (
        asof_join,
        asof_join_nearest,
    )

    rng = random.Random(20240814)
    t0 = dt.datetime(2024, 1, 1)
    for trial in range(4):
        keys = [1, 2, 3]
        left_rows = [
            (i, rng.choice(keys), t0 + dt.timedelta(seconds=rng.randrange(0, 500)))
            for i in range(40)
        ]
        right_ts = {(k, s) for k in keys for s in rng.sample(range(0, 500), 25)}
        right_rows = [
            (k, t0 + dt.timedelta(seconds=s), k * 1000 + s) for k, s in sorted(right_ts)
        ]
        left = spark.createDataFrame(left_rows, "lid long, k long, lts timestamp")
        right = spark.createDataFrame(right_rows, "k long, rts timestamp, rv long")
        lpdf = pd.DataFrame(left_rows, columns=["lid", "k", "lts"]).sort_values("lts")
        rpdf = pd.DataFrame(right_rows, columns=["k", "rts", "rv"]).sort_values("rts")

        for direction, tol in [
            ("backward", None),
            ("forward", None),
            ("nearest", None),
            ("nearest", 30.0),
        ]:
            if direction == "nearest":
                ours_df = asof_join_nearest(
                    left, right, "k", "lts", "rts", ["rv"],
                    tolerance_seconds=tol,
                )
            else:
                ours_df = asof_join(
                    left, right, "k", "lts", "rts", ["rv"],
                    direction=direction,
                )
            ours = {r["lid"]: r["rv_asof"] for r in ours_df.collect()}
            expected_pdf = pd.merge_asof(
                lpdf, rpdf, left_on="lts", right_on="rts", by="k",
                direction=direction,
                tolerance=None if tol is None else pd.Timedelta(seconds=tol),
            )
            expected = {
                int(r.lid): (None if pd.isna(r.rv) else int(r.rv))
                for r in expected_pdf.itertuples()
            }
            assert ours == expected, (trial, direction, tol)


def test_winnowing_matches_pure_python_reference(spark):
    """Differential test: the Spark expression chain must reproduce a
    naive Python implementation of winnowing (k-gram md5-prefix hashes,
    window minima, distinct) on random documents, and be invariant to
    input partitioning."""
    import hashlib
    import random

    from pinterest_data_pipeline_spark.operators.dedup import (
        winnowing_fingerprints,
    )

    def ref_fingerprints(text: str, k: int, window: int) -> set:
        toks = text.strip().split()
        if len(toks) >= k:
            grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        else:
            grams = [" ".join(toks)]
        gh = [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams
        ]
        if len(gh) >= window:
            minima = [min(gh[j : j + window]) for j in range(len(gh) - window + 1)]
        else:
            minima = [min(gh)]
        return set(minima)

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 60))))
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for k, w in [(5, 4), (3, 2), (1, 1)]:
        got: dict[int, set] = {}
        for r in winnowing_fingerprints(docs, k=k, window=w, portable=True).collect():
            got.setdefault(r["doc_id"], set()).add(r["fp"])
        for doc_id, text in rows:
            assert got[doc_id] == ref_fingerprints(text, k, w), (doc_id, k, w)
    # partition invariance
    one = sorted(
        (r["doc_id"], r["fp"])
        for r in winnowing_fingerprints(docs.repartition(1), portable=True).collect()
    )
    many = sorted(
        (r["doc_id"], r["fp"])
        for r in winnowing_fingerprints(docs.repartition(7), portable=True).collect()
    )
    assert one == many


def test_sqrt_temperature_shares_boost_low_resource_sources(spark):
    """The T=2 rule's defining property on skewed counts: every source's
    sqrt-share sits between its raw share and the uniform share
    (low-resource boosted, high-resource damped), shares sum to 1, and
    values match a sorted-order Python fold exactly."""
    import math

    from pinterest_data_pipeline_spark.operators.sampling import (
        sqrt_temperature_shares,
    )

    counts = {"web": 9000, "wiki": 900, "code": 90, "books": 10}
    rows = [(f"d{s}{i}", s) for s, n in counts.items() for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    out = {
        r["source"]: (r["n_docs"], r["w_r6"], r["share_r6"])
        for r in sqrt_temperature_shares(df, "source").collect()
    }
    total = sum(counts.values())
    norm = 0.0
    for s in sorted(counts):  # the operator's documented fold order
        norm += math.sqrt(counts[s])
    uniform = 1 / len(counts)
    for s, n in counts.items():
        n_docs, w, share = out[s]
        assert n_docs == n
        assert w == round(math.sqrt(n), 6)
        assert share == round(math.sqrt(n) / norm, 6)
        raw = n / total
        lo, hi = min(raw, uniform), max(raw, uniform)
        assert lo <= share <= hi, (s, raw, share, uniform)
    assert abs(sum(v[2] for v in out.values()) - 1.0) < 1e-5
