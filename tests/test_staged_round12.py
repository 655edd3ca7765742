"""Round-12 staging parity + behavior: the measurement-gap batch
(Poisson-bootstrap CI, O'Brien-Fleming interim looks, span-corruption
planning, profile drift, mutual nearest neighbors, LSH-cell
Davies-Bouldin, label-propagation communities, Fellegi-Sunter link
weights) must already pass the
exact check the driver will run once registered — strict-mirror value
comparison against their DuckDB oracles — and each operator's semantic
guarantees are pinned on constructed data.

The batch is fully promoted as of round 12 (six names in round 11, the
graph/linkage remainder in round 12); see plans/staged_round12.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.plans.staged_round12 import (
    STAGED_ORACLE,
    STAGED_QUERIES,
)
from tests.oracle_utils import (
    run_both_sides,
    compare_frames,
    duckdb_connection,
)


def test_promotion_split_matches_plan():
    """Round 11 promoted the first six of this batch; round 12
    promoted the graph/linkage remainder — the whole batch is now on
    the driver surface, oracles included."""
    import __spark_entry__ as entry_mod

    from pinterest_data_pipeline_spark.plans.staged_round12 import (
        PROMOTED,
    )

    assert PROMOTED == set(STAGED_QUERIES)
    queries = set(entry_mod.queries())
    oracles = set(entry_mod.oracle_sql())
    missing = PROMOTED - queries
    assert not missing, f"promoted queries not registered: {missing}"
    missing_oracle = PROMOTED - oracles
    assert not missing_oracle, f"promoted without oracle: {missing_oracle}"


def test_every_staged_query_has_an_oracle():
    assert set(STAGED_ORACLE) == set(STAGED_QUERIES)


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
@pytest.mark.parametrize("name", sorted(STAGED_QUERIES))
def test_staged_query_matches_oracle(spark, name, sf):
    d = f"/root/testdata/{sf}"
    # engine and oracle sides run concurrently (oracle_utils.run_both_sides:
    # both block outside the GIL, so the test pays max, not sum)
    spark_pdf, oracle_pdf, oracle_problems = run_both_sides(
        lambda: STAGED_QUERIES[name](spark, d).toPandas(),
        d,
        STAGED_ORACLE[name],
    )
    assert not oracle_problems, f"{name}@{sf}: {oracle_problems}"
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{name}@{sf}: {problems}"
    assert len(spark_pdf) > 0


# ---------------------------------------------------------- bootstrap


def test_poisson_thresholds_are_a_cdf():
    """Monotone, start ≈ e^-1·2^32, end ≈ 2^32 (tail mass ~1e-7)."""
    from pinterest_data_pipeline_spark.operators.bootstrap import (
        POISSON_CDF_U32,
    )

    assert POISSON_CDF_U32 == sorted(POISSON_CDF_U32)
    assert abs(POISSON_CDF_U32[0] / 2**32 - 0.3678794) < 1e-6
    assert POISSON_CDF_U32[-1] / 2**32 > 0.9999988


def test_bootstrap_ci_brackets_mean_and_weights_conserve(spark):
    """On a well-behaved planted sample the 95% CI must bracket the
    full-sample mean, sit strictly inside the data range, and the
    realized Poisson weights must average ≈ 1 (mass conservation — a
    broken threshold table would inflate or starve every resample)."""
    from pinterest_data_pipeline_spark.operators.bootstrap import (
        poisson_bootstrap_mean_ci,
        poisson_weight,
    )
    from pinterest_data_pipeline_spark.operators.dedup import portable_hash32

    df = spark.range(0, 2000).select(
        F.lit("g").alias("g"),
        F.col("id").alias("id"),
        (F.col("id") % 100).cast("long").alias("cents"),
    )
    out = poisson_bootstrap_mean_ci(df, ["g"], "id", "cents").collect()[0]
    assert out["n_rows"] == 2000 and out["n_resamples"] == 64
    assert out["ci_lo_r6"] <= out["mean_r6"] <= out["ci_hi_r6"]
    assert out["ci_lo_r6"] > 40 and out["ci_hi_r6"] < 60  # mean 49.5

    w = (
        spark.range(0, 50_000)
        .select(
            poisson_weight(
                portable_hash32(F.col("id").cast("string"))
            ).alias("w")
        )
        .agg(F.avg("w"))
        .collect()[0][0]
    )
    assert abs(w - 1.0) < 0.02


# ------------------------------------------------------ OBF sequential


def test_obf_hand_counts(spark):
    """Closed-form z on planted cumulative counts; OBF boundary shrinks
    as C·√(K/k); a huge final-look effect crosses, an early modest one
    does not (the whole point of alpha spending)."""
    from pinterest_data_pipeline_spark.operators.experiment import (
        group_sequential_obf,
    )

    looks = spark.createDataFrame(
        [
            (1, 100, 30, 100, 20),
            (5, 500, 200, 500, 100),
        ],
        "look int, n_treat long, conv_treat long, n_ctrl long, conv_ctrl long",
    )
    out = {r["look"]: r for r in group_sequential_obf(looks, "look").collect()}
    assert out[1]["z_r6"] == pytest.approx(1.632993, abs=1e-6)
    assert out[1]["boundary_r6"] == pytest.approx(2.04 * 5**0.5, abs=1e-5)
    assert not out[1]["crossed"]  # |1.63| < 4.56: early peek spends ~no alpha
    assert out[5]["z_r6"] == pytest.approx(6.900656, abs=1e-5)
    assert out[5]["boundary_r6"] == pytest.approx(2.04, abs=1e-6)
    assert out[5]["crossed"]
    assert out[1]["boundary_r6"] > out[5]["boundary_r6"]


# ------------------------------------------------- span corruption plan


def test_span_plan_bounds_and_rate(spark):
    """Spans live inside the token axis, segments keep them disjoint,
    the realized corruption rate sits at ~15% for long docs, and
    sub-span docs are excluded."""
    from pinterest_data_pipeline_spark.operators.corruption import (
        SPAN_LEN,
        span_corruption_plan,
    )

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(200))),
            (2, " ".join(f"t{i}" for i in range(7))),
            (3, "a b"),  # 2 tokens < SPAN_LEN: no legal span
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in span_corruption_plan(
        docs, "doc_id", "text"
    ).collect()}
    assert 3 not in out
    long_doc = out[1]
    assert long_doc["n_spans"] == 10  # round(200·0.05)
    assert long_doc["corrupted_tokens"] == 30
    assert long_doc["corruption_ppm"] == 150_000
    assert 0 <= long_doc["first_start"]
    assert long_doc["last_start"] + SPAN_LEN <= 200
    short = out[2]
    assert short["n_spans"] == 1 and 0 <= short["first_start"] <= 4


# ------------------------------------------------------- profile drift


def test_profile_drift_deltas_match_planted_mutations(spark, sf_dir):
    """The drift rows must equal independently-counted mutation
    effects: dropped rows, nulled statuses (net of drops), and the
    key NDV tracking the row count."""
    from pinterest_data_pipeline_spark.sources.parquet import load_table

    rows = {
        (r["col_name"], r["stat"]): r
        for r in STAGED_QUERIES["profile_drift_audit"](spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    n_dropped = o.where(F.col("k") % 1013 == 7).count()
    n_nulled = o.where(
        (F.col("k") % 503 == 1) & (F.col("k") % 1013 != 7)
    ).count()
    assert rows[("table", "n_rows")]["delta"] == -n_dropped
    assert rows[("k", "ndv")]["delta"] == -n_dropped
    assert rows[("status", "nulls")]["delta"] == n_nulled
    assert rows[("status", "nulls")]["v1"] == 0


# --------------------------------------------------------- mutual NN


def test_mutual_nn_planted_pairs_exclude_hub(spark):
    """Two tight pairs are mutual; a hub vector whose top-1 is one of
    them is NOT (its target's top-1 is its own partner) — reciprocity
    is exactly the filter that drops it."""
    import math

    from pinterest_data_pipeline_spark.operators.similarity import (
        mutual_top1_pairs,
    )

    def vec(deg):
        r = math.radians(deg)
        return [float(math.cos(r)), float(math.sin(r))]

    rows = [
        (1, vec(0.0)), (2, vec(1.0)),      # tight pair A
        (10, vec(90.0)), (11, vec(91.0)),  # tight pair B
        (99, vec(5.0)),                    # hub near pair A
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in mutual_top1_pairs(df).collect()
    }
    assert pairs == {(1, 2), (10, 11)}


# ------------------------------------------------------ DB cell quality


def test_db_index_two_separated_blobs(spark):
    """Two tight, far-apart blobs along the first seed-7 plane's axis:
    both cells must exist, every member lands with its blob, scatter is
    tiny relative to separation, so DB score ≪ 1."""
    from pinterest_data_pipeline_spark.operators.clustering import (
        lsh_cell_quality_db,
    )
    from pinterest_data_pipeline_spark.operators.similarity import (
        _hyperplanes,
    )

    plane = _hyperplanes(64, 32, 7)[0]
    pos = [[10.0 * p for p in plane]] * 5          # far along +plane
    neg = [[-10.0 * p for p in plane]] * 5         # far along −plane
    rows = [(i, v) for i, v in enumerate(pos + neg)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = lsh_cell_quality_db(df).collect()
    assert sum(r["n_members"] for r in out) == 10
    assert len(out) == 2
    for r in out:
        assert r["n_members"] == 5
        assert r["db_r6"] < 0.1


# ------------------------------------------------------------- LPA


def test_lpa_barbell_two_communities(spark):
    """Two triangles bridged by one edge resolve to two communities
    labeled by each triangle's smallest node id; fixed synchronous
    rounds with self-vote make the trajectory deterministic."""
    from pinterest_data_pipeline_spark.operators.labelprop import (
        community_sizes,
        label_propagation,
    )

    und = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (4, 6), (5, 6)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    labels = {
        r["node"]: r["label"]
        for r in label_propagation(edges, iterations=3).collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4}
    sizes = {
        r["community"]: r["n_nodes"]
        for r in community_sizes(edges, iterations=3).collect()
    }
    assert sizes == {1: 3, 4: 3}

    with pytest.raises(ValueError, match="iterations"):
        label_propagation(edges, iterations=0)


# --------------------------------------------------------- Fellegi-Sunter


def test_fs_weights_closed_form(spark):
    """Hand-built candidates with known m/u: weight of the all-agree
    pattern equals the closed-form Σ log2((am+1)/(tm+2) ÷ (au+1)/(tu+2)),
    agreement evidence is positive, disagreement negative, and the
    all-agree pattern dominates every other observed pattern."""
    import math

    from pinterest_data_pipeline_spark.operators.linkage import (
        fellegi_sunter_pattern_weights,
    )

    # 10 matches: 8 agree on f1, all 10 on f2; 90 non-matches: 9 agree
    # on f1, 45 on f2.
    rows = []
    rows += [(True, True, True)] * 8 + [(False, True, True)] * 2
    rows += [(True, True, False)] * 9 + [(False, True, False)] * 36
    rows += [(False, False, False)] * 45
    df = spark.createDataFrame(rows, "f1 boolean, f2 boolean, is_match boolean")
    out = {
        (r["f1"], r["f2"]): r["weight_r6"]
        for r in fellegi_sunter_pattern_weights(df, ["f1", "f2"]).collect()
    }
    m1, u1 = (8 + 1) / 12, (9 + 1) / 92
    m2, u2 = (10 + 1) / 12, (45 + 1) / 92
    expect = round(math.log2(m1 / u1) + math.log2(m2 / u2), 6)
    assert out[(True, True)] == pytest.approx(expect, abs=1e-6)
    assert out[(True, True)] > 0
    assert out[(False, False)] < 0
    assert all(out[(True, True)] >= v for v in out.values())


def test_fs_registered_matches_concentrate(spark, sf_dir):
    """On the re-entry scenario, true matches must sit overwhelmingly
    in patterns agreeing on name (the near-unique field), and the
    all-agree pattern must carry the maximum weight."""
    rows = STAGED_QUERIES["fellegi_sunter_link_weights"](
        spark, sf_dir
    ).collect()
    n_match_name = sum(r["n_match"] for r in rows if r["a_name"])
    n_match_total = sum(r["n_match"] for r in rows)
    assert n_match_total > 0
    # typo rate is 1-in-10 of twins; at sf0.001's 22 twins the integer
    # granularity puts the agree share at 19/22, so the bound is 0.75
    assert n_match_name / n_match_total > 0.75
    best = max(rows, key=lambda r: r["weight_r6"])
    assert best["a_name"] and best["a_bal"]
