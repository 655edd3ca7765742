"""Behavior tests for TF-IDF ranking, unigram LM scoring, and the event
funnel."""

from __future__ import annotations

import math

from pinterest_data_pipeline_spark.operators.funnel import (
    funnel_anchor_times,
    funnel_summary,
)
from pinterest_data_pipeline_spark.operators.tfidf import (
    tfidf_top_terms,
    unigram_logprob,
)


def test_tfidf_ranks_rare_terms_first(spark):
    df = spark.createDataFrame(
        [
            (1, "common common rare"),
            (2, "common filler filler"),
            (3, "common other other"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(df, k=1).collect()
    top = {r["doc_id"]: r for r in out}
    # 'common' appears in all 3 docs → idf = ln(1) = 0, never the top term.
    assert top[1]["term"] == "rare"
    assert top[2]["term"] == "filler"
    assert top[3]["term"] == "other"
    # doc 1: tf=1, df=1, n=3 → tfidf = ln(3)
    assert abs(top[1]["tfidf"] - round(math.log(3), 6)) < 1e-9
    # doc 2: tf=2 → 2·ln(3)
    assert abs(top[2]["tfidf"] - round(2 * math.log(3), 6)) < 1e-9


def test_tfidf_tie_breaks_on_term(spark):
    df = spark.createDataFrame(
        [(1, "beta alpha"), (2, "unrelated words")],
        "doc_id long, text string",
    )
    # both alpha and beta: tf=1, df=1 → identical scores; term asc wins.
    rows = [
        r
        for r in tfidf_top_terms(df, k=2).collect()
        if r["doc_id"] == 1
    ]
    assert [r["term"] for r in sorted(rows, key=lambda r: r["rk"])] == [
        "alpha",
        "beta",
    ]


def test_unigram_logprob_rare_tokens_score_low(spark):
    rows = [(i, "the usual fluent english sentence") for i in range(20)]
    rows.append((99, "zxqv kjgw pmntr"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    assert out[99]["avg_logprob"] < out[0]["avg_logprob"]
    assert out[99]["n_tokens"] == 3
    # hand-check: each rare token has count 1 of 103 total tokens.
    assert abs(out[99]["avg_logprob"] - round(math.log(1 / 103), 6)) < 1e-9


def test_funnel_strict_ordering_and_nulls(spark):
    df = spark.createDataFrame(
        [
            # u1 completes the funnel in order.
            (1, "view", "2024-01-01 00:00:00"),
            (1, "click", "2024-01-01 00:10:00"),
            (1, "purchase", "2024-01-01 00:20:00"),
            # u2 clicked BEFORE viewing → click doesn't count.
            (2, "click", "2024-01-01 00:00:00"),
            (2, "view", "2024-01-01 00:05:00"),
            # u3 view+click simultaneous → strict '>' rejects.
            (3, "view", "2024-01-01 00:00:00"),
            (3, "click", "2024-01-01 00:00:00"),
            # u4 never viewed.
            (4, "purchase", "2024-01-01 00:00:00"),
        ],
        "user_id long, event_type string, ts_s string",
    ).selectExpr("user_id", "event_type", "cast(ts_s as timestamp) as ts")
    anchors = {
        r["user_id"]: r
        for r in funnel_anchor_times(
            df, ["view", "click", "purchase"]
        ).collect()
    }
    assert set(anchors) == {1, 2, 3}  # u4 has no step-1 row
    assert anchors[1]["t3"] is not None
    assert anchors[2]["t2"] is None
    assert anchors[3]["t2"] is None
    summary = funnel_summary(df, ["view", "click", "purchase"]).collect()[0]
    assert summary["n_step1"] == 3
    assert summary["n_step2"] == 1
    assert summary["n_step3"] == 1
    assert summary["avg_sec_1_to_2"] == 600.0
    assert summary["avg_sec_2_to_3"] == 600.0


def test_funnel_anchors_at_earliest_qualifying_event(spark):
    # t1 is the EARLIEST view; t2 the EARLIEST click strictly after t1
    # (not the latest, not an arbitrary qualifying one).
    df = spark.createDataFrame(
        [
            (1, "view", "2024-01-01 01:00:00"),
            (1, "view", "2024-01-01 00:00:00"),
            (1, "click", "2024-01-01 00:00:30"),
            (1, "click", "2024-01-01 00:00:10"),
        ],
        "user_id long, event_type string, ts_s string",
    ).selectExpr("user_id", "event_type", "cast(ts_s as timestamp) as ts")
    row = funnel_anchor_times(df, ["view", "click"]).collect()[0]
    assert str(row["t1"]).startswith("2024-01-01 00:00:00")
    assert str(row["t2"]).startswith("2024-01-01 00:00:10")


def test_weekly_retention_cohort_math(spark):
    from pinterest_data_pipeline_spark.operators.cohorts import (
        weekly_retention,
    )

    df = spark.createDataFrame(
        [
            # u1 first active Mon 2024-01-01 week; active again wk+1
            (1, "2024-01-02 10:00:00"),
            (1, "2024-01-09 10:00:00"),
            # u2 same cohort, never returns
            (2, "2024-01-03 09:00:00"),
            # u3 cohort of the NEXT week
            (3, "2024-01-10 12:00:00"),
        ],
        "user_id long, ts_s string",
    ).selectExpr("user_id", "cast(ts_s as timestamp) as ts")
    rows = {
        (str(r["cohort_week"]), r["week_offset"]): r
        for r in weekly_retention(df).collect()
    }
    w1 = ("2024-01-01", 0)
    assert rows[w1]["cohort_size"] == 2 and rows[w1]["n_active"] == 2
    assert rows[w1]["retention"] == 1.0
    assert rows[("2024-01-01", 1)]["n_active"] == 1
    assert rows[("2024-01-01", 1)]["retention"] == 0.5
    assert rows[("2024-01-08", 0)]["cohort_size"] == 1
    assert ("2024-01-08", 1) not in rows
