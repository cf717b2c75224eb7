"""Temporal joins: as-of (backward/forward, ties, no-match) and range
join (binned path ≡ exact inequality path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crysda_spark import Frame, from_records


def _sides(spark):
    left = from_records(spark, [
        {"k": "a", "ts": 10, "x": "l1"},
        {"k": "a", "ts": 20, "x": "l2"},
        {"k": "a", "ts": 5, "x": "l0"},   # before any right row
        {"k": "b", "ts": 10, "x": "l3"},
    ], order=["k", "ts", "x"])
    right = from_records(spark, [
        {"k": "a", "ts": 8, "v": 1.0},
        {"k": "a", "ts": 20, "v": 2.0},   # tie with l2
        {"k": "a", "ts": 30, "v": 3.0},
        {"k": "b", "ts": 12, "v": 9.0},
    ], order=["k", "ts", "v"])
    return left, right


def test_asof_backward(spark):
    left, right = _sides(spark)
    out = left.asof_join(right, on="ts", by="k", value_cols=["v"])
    got = {r.x: (r.v_right, r.ts_right) for r in out.sdf.collect()}
    assert got == {
        "l0": (None, None),   # nothing at or before ts=5
        "l1": (1.0, 8),
        "l2": (2.0, 20),      # tie matches (>= semantics)
        "l3": (None, None),   # b's only right row is later
    }


def test_asof_forward(spark):
    left, right = _sides(spark)
    out = left.asof_join(right, on="ts", by="k", value_cols=["v"],
                         direction="forward")
    got = {r.x: r.v_right for r in out.sdf.collect()}
    assert got == {"l0": 1.0, "l1": 2.0, "l2": 2.0, "l3": 9.0}


def test_asof_keeps_left_count(spark, orders):
    left = Frame(orders.sdf.select("o_orderkey", "o_custkey",
                                   F.col("o_orderdate").alias("ts")))
    right = Frame(orders.sdf.select("o_custkey",
                                    F.col("o_orderdate").alias("ts"),
                                    "o_totalprice").limit(100))
    out = left.asof_join(right, on="ts", by="o_custkey",
                         value_cols=["o_totalprice"])
    assert out.num_row == left.num_row  # never inflates, never drops


def test_range_join_outer_stable_after_shuffle(spark, orders):
    """Outer range-join ids must be frozen (localCheckpoint) so the
    matched join and the anti-join see the SAME id assignment even when
    the left side is the output of a shuffle."""
    left = (orders.group_by("o_custkey")
            .summarize(v=__import__("pyspark.sql.functions", fromlist=["F"]).avg("o_totalprice"))
            .rename({"o_custkey": "k"}))
    n_left = left.num_row
    right = from_records(spark, [
        {"lo": 0.0, "hi": 100000.0}, {"lo": 100000.0, "hi": 200000.0}])
    out = left.range_join(right, "v", "lo", "hi", bin_width=100000.0, how="left")
    # every left row appears >=1 time; matched rows never also appear null-extended
    import pyspark.sql.functions as F
    per = out.sdf.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("lo").isNull().cast("int")).alias("null_rows"))
    assert per.count() == n_left
    bad = per.filter((F.col("null_rows") > 0) & (F.col("n") > F.col("null_rows"))).count()
    assert bad == 0  # no row is both matched and null-extended


def test_asof_nearest_picks_closer_side(spark):
    left = from_records(spark, [
        {"k": "a", "ts": 10}, {"k": "a", "ts": 100}, {"k": "a", "ts": 55}])
    right = from_records(spark, [
        {"k": "a", "ts": 8, "v": "early"}, {"k": "a", "ts": 102, "v": "late"}])
    out = left.asof_join(right, on="ts", by="k", value_cols=["v"],
                         direction="nearest")
    got = {r["ts"]: r["v_right"] for r in out.sdf.collect()}
    # 10 → early (Δ2 vs Δ92); 100 → late (Δ2); 55 → early (Δ47 ties? no: Δ47 vs Δ47 → backward wins)
    assert got[10] == "early" and got[100] == "late"
    assert got[55] == "early"  # equidistant → backward wins
    # one-sided: only a forward match exists
    left2 = from_records(spark, [{"k": "a", "ts": 1}])
    out2 = left2.asof_join(right, on="ts", by="k", value_cols=["v"],
                           direction="nearest")
    assert out2.sdf.collect()[0]["v_right"] == "early"


def test_frame_profile_one_pass(spark, orders):
    prof = orders.profile("o_orderkey", "o_orderstatus", exact_distinct=True)
    rows = {r["column"]: r for r in prof.sdf.collect()}
    n = orders.num_row
    assert rows["o_orderkey"]["n"] == n and rows["o_orderkey"]["nulls"] == 0
    assert rows["o_orderkey"]["n_distinct"] == n  # primary key
    assert rows["o_orderstatus"]["mean"] is None  # non-numeric
    assert rows["o_orderkey"]["mean"] is not None
    assert int(rows["o_orderkey"]["min_v"]) <= int(rows["o_orderkey"]["max_v"])


def test_range_join_binned_equals_exact(spark):
    left = from_records(spark, [{"id": i, "v": float(i)} for i in range(30)])
    right = from_records(spark, [
        {"iv": j, "lo": j * 7.0, "hi": j * 7.0 + 10.0} for j in range(5)])
    exact = left.range_join(right, "v", "lo", "hi").sdf
    binned = left.range_join(right, "v", "lo", "hi", bin_width=7.0).sdf
    e = {(r.id, r.iv) for r in exact.collect()}
    b = {(r.id, r.iv) for r in binned.collect()}
    assert e == b and len(e) > 30  # overlapping intervals multi-match


def test_range_join_with_keys(spark):
    left = from_records(spark, [
        {"k": "a", "v": 5.0}, {"k": "b", "v": 5.0}])
    right = from_records(spark, [
        {"k": "a", "lo": 0.0, "hi": 10.0}, {"k": "b", "lo": 6.0, "hi": 10.0}])
    out = left.range_join(right, "v", "lo", "hi", by=["k"], bin_width=5.0)
    assert [r.k for r in out.sdf.collect()] == ["a"]


def test_range_join_outer_semantics(spark):
    """how='left'/'full' keep unmatched rows null-extended — the range
    predicate must not run as a post-join filter (which would drop the
    null rows and silently revert to inner)."""
    left = from_records(spark, [
        {"k": "a", "v": 5.0}, {"k": "b", "v": 99.0}])   # b matches nothing
    right = from_records(spark, [
        {"k": "a", "lo": 0.0, "hi": 10.0}, {"k": "c", "lo": 0.0, "hi": 1.0}])
    for bw in (None, 5.0):
        lj = left.range_join(right, "v", "lo", "hi", by=["k"],
                             bin_width=bw, how="left").sdf.collect()
        got = {(r.k, r.v, r.lo) for r in lj}
        assert got == {("a", 5.0, 0.0), ("b", 99.0, None)}
        fj = left.range_join(right, "v", "lo", "hi", by=["k"],
                             bin_width=bw, how="full").sdf.collect()
        gotf = {(r.k, r.v, r.lo) for r in fj}
        assert gotf == {("a", 5.0, 0.0), ("b", 99.0, None), ("c", None, 0.0)}
    import pytest
    with pytest.raises(ValueError):
        left.range_join(right, "v", "lo", "hi", how="bogus")


# ------------------------------------------------------------- sessionize
def test_sessionize_gaps_and_islands(spark):
    from crysda_spark.operators.temporal import sessionize
    rows = [
        (1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:10:00"),
        (1, "2024-01-01 12:00:00"),                    # > 1h gap → session 2
        (2, "2024-01-01 09:00:00"),
    ]
    f = Frame(spark.createDataFrame(rows, "uid long, ts string")
              .withColumn("ts", F.col("ts").cast("timestamp")))
    out = sessionize(f, "ts", "uid", gap_seconds=3600).sdf.collect()
    got = {(r["uid"], str(r["ts"])): r["session_seq"] for r in out}
    assert got[(1, "2024-01-01 10:00:00")] == 1
    assert got[(1, "2024-01-01 10:10:00")] == 1
    assert got[(1, "2024-01-01 12:00:00")] == 2
    assert got[(2, "2024-01-01 09:00:00")] == 1


def test_sessionize_exact_gap_is_same_session(spark):
    from crysda_spark.operators.temporal import sessionize
    rows = [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 11:00:00")]
    f = Frame(spark.createDataFrame(rows, "uid long, ts string")
              .withColumn("ts", F.col("ts").cast("timestamp")))
    out = sessionize(f, "ts", "uid", gap_seconds=3600).sdf.collect()
    assert {r["session_seq"] for r in out} == {1}  # gap == threshold: same


def test_sessionize_rejects_column_clash(spark):
    from crysda_spark.operators.temporal import sessionize
    f = Frame(spark.createDataFrame([(1, 1.0)], "uid long, session_seq double"))
    with pytest.raises(ValueError, match="already exists"):
        sessionize(f, "session_seq", "uid", 10)
