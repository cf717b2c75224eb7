"""Funnel / retention analytics (operators/funnel.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crysda_spark import Frame
from crysda_spark.operators.funnel import funnel, retention_cohorts


def _events(spark, rows):
    return Frame(spark.createDataFrame(rows, "user_id long, ts string, event_type string")
                 .withColumn("ts", F.col("ts").cast("timestamp")))


def test_funnel_ordered_completion(spark):
    f = _events(spark, [
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:05:00", "click"),
        (1, "2024-01-01 10:10:00", "buy"),
        (2, "2024-01-01 11:00:00", "view"),
        (2, "2024-01-01 11:05:00", "click"),
        (3, "2024-01-01 12:05:00", "click"),   # click BEFORE view → no credit
        (3, "2024-01-01 12:10:00", "view"),
    ])
    out = {r["step"]: r for r in
           funnel(f, ["view", "click", "buy"]).sdf.collect()}
    assert (out[1]["n_users"], out[2]["n_users"], out[3]["n_users"]) == (3, 2, 1)
    assert out[3]["conversion"] == pytest.approx(1 / 3, abs=1e-6)


def test_funnel_within_window(spark):
    f = _events(spark, [
        (1, "2024-01-01 10:00:00", "a"),
        (1, "2024-01-01 10:00:30", "b"),     # 30s later: inside 60s window
        (2, "2024-01-01 10:00:00", "a"),
        (2, "2024-01-01 10:02:00", "b"),     # 120s later: outside
    ])
    out = {r["step"]: r["n_users"] for r in
           funnel(f, ["a", "b"], within_seconds=60).sdf.collect()}
    assert out == {1: 2, 2: 1}


def test_funnel_greedy_uses_earliest_qualifying(spark):
    # user does a → b(late, outside window) → a again? Greedy binds to
    # the FIRST a; a second 'b' inside the window from first 'a' counts.
    f = _events(spark, [
        (1, "2024-01-01 10:00:00", "a"),
        (1, "2024-01-01 10:10:00", "a"),
        (1, "2024-01-01 10:00:40", "b"),
    ])
    out = {r["step"]: r["n_users"] for r in
           funnel(f, ["a", "b"], within_seconds=60).sdf.collect()}
    assert out == {1: 1, 2: 1}


def test_funnel_validation(spark):
    f = _events(spark, [(1, "2024-01-01 00:00:00", "a")])
    with pytest.raises(ValueError, match="at least one"):
        funnel(f, [])


def test_retention_cohorts_matrix(spark):
    f = _events(spark, [
        (1, "2024-01-01 10:00:00", "x"),    # cohort W1 (Mon 2024-01-01)
        (1, "2024-01-08 10:00:00", "x"),    # active W2 → offset 1
        (2, "2024-01-01 10:00:00", "x"),    # cohort W1, never returns
        (3, "2024-01-08 10:00:00", "x"),    # cohort W2
        (3, "2024-01-22 10:00:00", "x"),    # offset 2
    ])
    got = {(str(r["cohort"]), r["offset"]): (r["n_active"], r["retention"])
           for r in retention_cohorts(f, grain="week").sdf.collect()}
    assert got[("2024-01-01 00:00:00", 0)] == (2, 1.0)
    assert got[("2024-01-01 00:00:00", 1)] == (1, 0.5)
    assert got[("2024-01-08 00:00:00", 0)] == (1, 1.0)
    assert got[("2024-01-08 00:00:00", 2)] == (1, 1.0)
    assert ("2024-01-08 00:00:00", 1) not in got


def test_retention_validation(spark):
    f = _events(spark, [(1, "2024-01-01 00:00:00", "x")])
    with pytest.raises(ValueError, match="day|week|month"):
        retention_cohorts(f, grain="hour")


def test_event_transitions_counts_and_probs(spark):
    from crysda_spark.operators.funnel import event_transitions
    rows = [
        (1, 10, "view", 1), (2, 10, "click", 2), (3, 10, "view", 3),
        (4, 11, "view", 1), (5, 11, "click", 2), (6, 11, "buy", 3),
        (7, 12, "view", 1),                      # lone event: no pair
    ]
    f = Frame(spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts long"))
    got = {(r["from_event"], r["to_event"]): (r["n"], r["p"]) for r in
           event_transitions(f, "event_type", "user_id", "ts",
                             tiebreak_col="event_id").sdf.collect()}
    # view->click twice (u10, u11); click->view once; click->buy once
    assert got[("view", "click")] == (2, 1.0)
    assert got[("click", "view")] == (1, 0.5)
    assert got[("click", "buy")] == (1, 0.5)
    assert ("view", "view") not in got and len(got) == 3


def test_event_transitions_include_end_rows_sum_to_one(spark):
    from crysda_spark.operators.funnel import event_transitions
    rows = [(1, 10, "a", 1), (2, 10, "b", 2), (3, 11, "a", 1)]
    f = Frame(spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts long"))
    out = event_transitions(f, "event_type", "user_id", "ts",
                            tiebreak_col="event_id",
                            include_end=True).sdf
    got = {(r["from_event"], r["to_event"]): (r["n"], r["p"])
           for r in out.collect()}
    # a -> b once, a -> __end__ once (u11), b -> __end__ once
    assert got[("a", "b")] == (1, 0.5)
    assert got[("a", "__end__")] == (1, 0.5)
    assert got[("b", "__end__")] == (1, 1.0)
    from collections import defaultdict
    sums = defaultdict(float)
    for (frm, _to), (_n, p) in got.items():
        sums[frm] += p
    assert all(abs(v - 1.0) < 1e-9 for v in sums.values())
